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


def run_case(exe, dat_path, json_path, max_fact=None):
    cmd = [exe, dat_path] + ([str(max_fact)] if max_fact else [])
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

    for name, prob, drift in warm_corpus():
        base_path = os.path.join(CASES, name + "_base.dat")
        io_dat.save_dat(base_path, from_inequality(prob))
        rec0 = run_case(exe, base_path, os.path.join(OUT, name + "_base.json"))
        index[name + "_base"] = {"dat": os.path.relpath(base_path, OUT),
                                 "status": rec0.get("status")}
        # guess = the base solve's final per-row activation types (EQ is
        # determined internally from lb==ub, so write INACTIVE for it)
        guess = np.concatenate([np.asarray(g, np.int64)
                                for g in rec0["active"]])
        guess[guess == 3] = 0
        x0 = np.asarray(rec0["x"], float)
        warm = type(prob)(
            A=prob.A + drift, lb=prob.lb.copy(), ub=prob.ub.copy(),
            dims=tuple(prob.dims), n_var=prob.n_var,
            simple_bounds=prob.simple_bounds,
            var_idx=None if prob.var_idx is None else prob.var_idx.copy(),
            regularization=prob.regularization.copy())
        dat_path = os.path.join(CASES, name + ".dat")
        io_dat.save_dat(dat_path, from_inequality(
            warm, active_set_guess=guess, solution_guess=x0))
        rec = run_case(exe, dat_path, os.path.join(OUT, name + ".json"))
        index[name] = {"dat": os.path.relpath(dat_path, OUT),
                       "status": rec.get("status"), "warm": True}
        print(name, "status", rec.get("status"),
              "fact", rec.get("factorizations"),
              "(cold base:", rec0.get("factorizations"), ")")

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
