"""Independent cross-check: cascade-of-QPs oracle (SURVEY §4.3 —
reference ``qpsequence.m`` solved a sequence of QPs via qpOASES; here
SciPy's SLSQP stands in).

The classical hierarchical-QP method: solve level k as
    min ||v_k||^2  over (x, v_k)
    s.t.  lb_j <= A_j x - v_j* <= ub_j   (j < k, residuals frozen)
          lb_k <= A_k x - v_k <= ub_k
and freeze v_k* for the next level.  The optimal residual *norms* per
level must match the active-set solver (x itself may differ under rank
deficiency)."""

import numpy as np
import pytest

try:
    from scipy.optimize import minimize

    HAVE_SCIPY = True
except Exception:  # pragma: no cover
    HAVE_SCIPY = False

import lexls_tpu.lexlsi as jli
from lexls_tpu.oracle import generate as gen


def qp_cascade(prob, tol=1e-12):
    """Solve the hierarchy by a cascade of QPs; returns per-level ||v_k||."""
    n = prob.n_var
    x = np.zeros(n)
    frozen = []  # (A_j, lo_j, hi_j) with residual folded into the bounds
    norms = []
    ofs = 0
    for k, d in enumerate(prob.dims):
        Ak = prob.A[ofs : ofs + d]
        lbk = prob.lb[ofs : ofs + d]
        ubk = prob.ub[ofs : ofs + d]

        def obj(z, Ak=Ak, d=d):
            v = z[n : n + d]
            return 0.5 * float(v @ v)

        def grad(z, d=d):
            g = np.zeros(n + d)
            g[n:] = z[n:]
            return g

        cons = []
        for (Aj, loj, hij) in frozen:
            cons.append({"type": "ineq",
                         "fun": lambda z, Aj=Aj, loj=loj: Aj @ z[:n] - loj,
                         "jac": lambda z, Aj=Aj, d=d: np.hstack([Aj, np.zeros((Aj.shape[0], d))])})
            cons.append({"type": "ineq",
                         "fun": lambda z, Aj=Aj, hij=hij: hij - Aj @ z[:n],
                         "jac": lambda z, Aj=Aj, d=d: np.hstack([-Aj, np.zeros((Aj.shape[0], d))])})
        cons.append({"type": "ineq",
                     "fun": lambda z, Ak=Ak, lbk=lbk, d=d: Ak @ z[:n] - z[n:n + d] - lbk,
                     "jac": lambda z, Ak=Ak, d=d: np.hstack([Ak, -np.eye(d)])})
        cons.append({"type": "ineq",
                     "fun": lambda z, Ak=Ak, ubk=ubk, d=d: ubk - Ak @ z[:n] + z[n:n + d],
                     "jac": lambda z, Ak=Ak, d=d: np.hstack([-Ak, np.eye(d)])})

        z0 = np.concatenate([x, Ak @ x - np.clip(Ak @ x, lbk, ubk)])
        res = minimize(obj, z0, jac=grad, constraints=cons, method="SLSQP",
                       options={"maxiter": 500, "ftol": 1e-14})
        x = res.x[:n]
        vk = res.x[n : n + prob.dims[k]]
        norms.append(np.linalg.norm(vk))
        frozen.append((Ak, lbk + vk, ubk + vk))
        ofs += d
    return np.array(norms)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy not available")
@pytest.mark.parametrize("seed", range(3))
def test_qp_cascade_residual_norms(seed):
    rng = np.random.default_rng(800 + seed)
    prob = gen.random_inequality_hierarchy(rng, 6, [3, 3], equality_fraction=0.0)
    jres = jli.solve(prob)
    qp_norms = qp_cascade(prob)
    ofs = 0
    for k, d in enumerate(prob.dims):
        ln = np.linalg.norm(jres.v[ofs : ofs + d])
        assert abs(ln - qp_norms[k]) < 1e-5, (k, ln, qp_norms[k])
        ofs += d
