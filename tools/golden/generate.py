"""Generate golden parity fixtures from the compiled REFERENCE solver.

Builds ``golden_gen.cpp`` against the reference headers (read-only at
/root/reference/include) and the Eigen headers vendored by the installed
tensorflow package, exports a corpus of random hierarchies through
``lexls_tpu.io.save_dat``, runs the reference solver on each, and stores
the machine-readable results in ``tests/golden/``.

The .dat corpora and the JSON goldens are checked in, so the Python
parity suite (tests/test_golden_parity.py) runs anywhere — this script
only needs re-running when the corpus definition changes.

Usage: python tools/golden/generate.py
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.join(REPO, "tools", "golden")
OUT = os.path.join(REPO, "tests", "golden")
CASES = os.path.join(OUT, "cases")
REFERENCE_INCLUDE = "/root/reference/include"
REFERENCE_TEST_01 = "/root/reference/tests/test_01.dat"

sys.path.insert(0, REPO)


def find_eigen():
    for pattern in (
        "/opt/venv/lib/python3*/site-packages/tensorflow/include",
        "/usr/include/eigen3",
    ):
        hits = glob.glob(pattern)
        if hits and os.path.isdir(os.path.join(hits[0], "Eigen")):
            return hits[0]
    raise RuntimeError("No Eigen headers found")


def build():
    exe = os.path.join(HERE, "golden_gen")
    src = os.path.join(HERE, "golden_gen.cpp")
    if os.path.exists(exe) and os.path.getmtime(exe) > os.path.getmtime(src):
        return exe
    cmd = ["g++", "-O2", "-std=c++14", f"-I{REFERENCE_INCLUDE}",
           f"-I{find_eigen()}", src, "-o", exe]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return exe


def run_case(exe, dat_path, json_path, max_fact=None, reg=None):
    cmd = [exe, dat_path] + ([str(max_fact)] if max_fact else [])
    if reg is not None:
        reg_type, factors = reg
        cmd += ["--reg", str(int(reg_type)),
                ",".join(f"{f:.17g}" for f in factors)]
    out = subprocess.run(cmd, check=True, capture_output=True, text=True)
    rec = json.loads(out.stdout)
    with open(json_path, "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def corpus():
    """(name, problem) pairs: random shapes covering rank deficiency,
    equalities, tight bounds, simple-bounds level 0, deep hierarchies."""
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(20):
        rng = np.random.default_rng(9000 + trial)
        n = int(rng.integers(4, 20))
        p = int(rng.integers(1, 6))
        dims = [int(rng.integers(1, 8)) for _ in range(p)]
        simple = bool(rng.random() < 0.3) and dims[0] <= n
        ranks = None
        if rng.random() < 0.5:
            ranks = [min(d, int(rng.integers(1, d + 1))) for d in dims]
        prob = gen.random_inequality_hierarchy(
            rng, n, dims, ranks=ranks,
            equality_fraction=float(rng.random() * 0.4),
            tight_fraction=float(rng.random() * 0.7),
            simple_bounds=simple)
        cases.append((f"ineq_{trial:02d}", prob))
    return cases


def warm_corpus():
    """Warm-start cases (the reference's design point, hot_start.tex):
    base problems whose cold golden supplies the guess for a drifted
    problem, written as HierType-210 .dat (activation guess + SolGuess)
    so the reference solves them warm-started through api_activate /
    set_x0 exactly like the MEX binding."""
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(8):
        rng = np.random.default_rng(9500 + trial)
        n = int(rng.integers(6, 20))
        p = int(rng.integers(2, 5))
        dims = [int(rng.integers(2, 8)) for _ in range(p)]
        simple = bool(rng.random() < 0.25) and dims[0] <= n
        prob = gen.random_inequality_hierarchy(
            rng, n, dims,
            equality_fraction=float(rng.random() * 0.3),
            tight_fraction=float(0.2 + rng.random() * 0.5),
            simple_bounds=simple)
        drift = 1e-3 * rng.standard_normal(prob.A.shape)
        if simple:
            drift[:dims[0], :] = 0.0  # structural one-hot rows
        cases.append((f"warm_{trial:02d}", prob, drift))
    return cases


def warm_sb_corpus():
    """Simple-bounds warm pairs (VERDICT r3 weak 6): level 0 is a
    SIMPLE_BOUNDS_OBJECTIVE whose active rows fix variables — the regime
    the fused kernel's d0 path and the tracker's bounds handling must
    match the reference on warm starts."""
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(6):
        rng = np.random.default_rng(9700 + trial)
        n = int(rng.integers(8, 20))
        p = int(rng.integers(2, 5))
        dims = [int(rng.integers(2, min(8, n)))] + [
            int(rng.integers(2, 8)) for _ in range(p - 1)]
        prob = gen.random_inequality_hierarchy(
            rng, n, dims,
            equality_fraction=float(rng.random() * 0.3),
            tight_fraction=float(0.25 + rng.random() * 0.5),
            simple_bounds=True)
        drift = 1e-3 * rng.standard_normal(prob.A.shape)
        drift[:dims[0], :] = 0.0  # structural one-hot rows
        cases.append((f"warm_sb_{trial:02d}", prob, drift))
    return cases


def warm_tik_corpus():
    """TIKHONOV-regularized warm pairs: the damped solve path
    (``regularize_tikhonov``, lexlse.h:1700-1763) under warm starts —
    the tracker's supported regularization mode."""
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(6):
        rng = np.random.default_rng(9800 + trial)
        n = int(rng.integers(6, 16))
        p = int(rng.integers(2, 4))
        dims = [int(rng.integers(2, 7)) for _ in range(p)]
        ranks = [min(d, int(rng.integers(1, d + 1))) for d in dims]
        prob = gen.random_inequality_hierarchy(
            rng, n, dims, ranks=ranks,
            equality_fraction=float(rng.random() * 0.25),
            tight_fraction=float(0.2 + rng.random() * 0.4))
        factors = [float(10.0 ** rng.uniform(-4, -2)) for _ in dims]
        drift = 1e-3 * rng.standard_normal(prob.A.shape)
        cases.append((f"warm_tik_{trial:02d}", prob, drift, factors))
    return cases


def seq_corpus():
    """Multi-step drifted sequences (doc/hot_start.tex:437-571): solve t
    seeds solve t+1 through the reference itself, 3 warm steps each —
    the regime the cross-solve tracker optimizes."""
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(4):
        rng = np.random.default_rng(9900 + trial)
        n = int(rng.integers(8, 18))
        p = int(rng.integers(2, 5))
        dims = [int(rng.integers(2, 7)) for _ in range(p)]
        simple = trial % 2 == 1 and dims[0] <= n
        prob = gen.random_inequality_hierarchy(
            rng, n, dims,
            equality_fraction=float(rng.random() * 0.25),
            tight_fraction=float(0.25 + rng.random() * 0.4),
            simple_bounds=simple)
        drifts = []
        for _ in range(3):
            d = 1e-3 * rng.standard_normal(prob.A.shape)
            if simple:
                d[:dims[0], :] = 0.0
            drifts.append(d)
        cases.append((f"seq_{trial:02d}", prob, drifts))
    return cases


def eq_corpus():
    from lexls_tpu.oracle import generate as gen

    cases = []
    for trial in range(6):
        rng = np.random.default_rng(7000 + trial)
        n = int(rng.integers(4, 20))
        p = int(rng.integers(1, 6))
        dims = [int(rng.integers(1, 8)) for _ in range(p)]
        ranks = None
        if rng.random() < 0.6:
            ranks = [min(d, int(rng.integers(1, d + 1))) for d in dims]
        A, b, dims_t, _, _ = gen.random_equality_hierarchy(
            rng, n, dims, ranks=ranks)
        cases.append((f"eq_{trial:02d}", (A, b, dims_t, n)))
    return cases


def main():
    from lexls_tpu.io import dat as io_dat
    from lexls_tpu.io.dat import DatHierarchy, from_inequality

    os.makedirs(CASES, exist_ok=True)
    exe = build()

    index = {}

    if os.path.exists(REFERENCE_TEST_01):
        rec = run_case(exe, REFERENCE_TEST_01,
                       os.path.join(OUT, "test_01.json"))
        index["test_01"] = {"dat": REFERENCE_TEST_01,
                            "status": rec.get("status")}
        print("test_01:", rec.get("status"), rec.get("factorizations"))

    for name, prob in corpus():
        dat_path = os.path.join(CASES, name + ".dat")
        io_dat.save_dat(dat_path, from_inequality(prob))
        rec = run_case(exe, dat_path, os.path.join(OUT, name + ".json"))
        index[name] = {"dat": os.path.relpath(dat_path, OUT),
                       "status": rec.get("status")}
        print(name, "status", rec.get("status"),
              "fact", rec.get("factorizations"))

    def drifted(prob, drift, regularization=None):
        return type(prob)(
            A=prob.A + drift, lb=prob.lb.copy(), ub=prob.ub.copy(),
            dims=tuple(prob.dims), n_var=prob.n_var,
            simple_bounds=prob.simple_bounds,
            var_idx=None if prob.var_idx is None else prob.var_idx.copy(),
            regularization=(prob.regularization.copy()
                            if regularization is None
                            else np.asarray(regularization, float)))

    def guess_of(rec):
        # the previous solve's final per-row activation types (EQ is
        # determined internally from lb==ub, so write INACTIVE for it)
        guess = np.concatenate([np.asarray(g, np.int64)
                                for g in rec["active"]])
        guess[guess == 3] = 0
        return guess

    def warm_step(name, warm_prob, guess, x0, reg=None, extra=None):
        """Write a HierType-210 .dat + solve it with the reference."""
        dat_path = os.path.join(CASES, name + ".dat")
        io_dat.save_dat(dat_path, from_inequality(
            warm_prob, active_set_guess=guess, solution_guess=x0))
        rec = run_case(exe, dat_path, os.path.join(OUT, name + ".json"),
                       reg=reg)
        index[name] = {"dat": os.path.relpath(dat_path, OUT),
                       "status": rec.get("status"), "warm": True,
                       **(extra or {})}
        return rec

    def warm_pair(name, prob, drift, reg=None, extra=None):
        base_path = os.path.join(CASES, name + "_base.dat")
        io_dat.save_dat(base_path, from_inequality(prob))
        rec0 = run_case(exe, base_path,
                        os.path.join(OUT, name + "_base.json"), reg=reg)
        index[name + "_base"] = {"dat": os.path.relpath(base_path, OUT),
                                 "status": rec0.get("status"),
                                 **(extra or {})}
        rec = warm_step(name, drifted(prob, drift), guess_of(rec0),
                        np.asarray(rec0["x"], float), reg=reg, extra=extra)
        print(name, "status", rec.get("status"),
              "fact", rec.get("factorizations"),
              "(cold base:", rec0.get("factorizations"), ")")

    for name, prob, drift in warm_corpus():
        warm_pair(name, prob, drift)

    for name, prob, drift in warm_sb_corpus():
        warm_pair(name, prob, drift)

    for name, prob, drift, factors in warm_tik_corpus():
        # REGULARIZATION_TIKHONOV = 1 (typedefs.h:35); the drifted .dat
        # carries the factors so the Python side solves identically
        warm_pair(name, prob, drift, reg=(1, factors),
                  extra={"reg_type": 1, "reg_factors": factors})

    for name, prob, drifts in seq_corpus():
        base_path = os.path.join(CASES, name + "_t0.dat")
        io_dat.save_dat(base_path, from_inequality(prob))
        rec = run_case(exe, base_path, os.path.join(OUT, name + "_t0.json"))
        index[name + "_t0"] = {"dat": os.path.relpath(base_path, OUT),
                               "status": rec.get("status"), "seq": name}
        acc = np.zeros_like(prob.A)
        for t, drift in enumerate(drifts, start=1):
            acc = acc + drift
            rec = warm_step(f"{name}_t{t}", drifted(prob, acc),
                            guess_of(rec), np.asarray(rec["x"], float),
                            extra={"seq": name, "step": t})
            print(f"{name}_t{t}", "status", rec.get("status"),
                  "fact", rec.get("factorizations"))

    for name, (A, b, dims_t, n_var) in eq_corpus():
        dat_path = os.path.join(CASES, name + ".dat")
        objectives = []
        ofs = 0
        for d in dims_t:
            objectives.append(np.column_stack([A[ofs:ofs + d], b[ofs:ofs + d]]))
            ofs += d
        io_dat.save_dat(dat_path, DatHierarchy(
            hier_type=io_dat.HIER_EQUALITIES, n_var=n_var,
            objectives=objectives,
            obj_type=np.full(len(dims_t), io_dat.OBJ_GENERAL, np.int32)))
        rec = run_case(exe, dat_path, os.path.join(OUT, name + ".json"))
        index[name] = {"dat": os.path.relpath(dat_path, OUT)}
        print(name, "v_norms", [f"{v:.3e}" for v in rec["v_norms"]])

    with open(os.path.join(OUT, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    print(f"wrote {len(index)} goldens to {OUT}")


if __name__ == "__main__":
    main()
