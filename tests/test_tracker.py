"""Cross-solve warm tracker (lexls_tpu/tracker.py) parity tests.

The tracker re-factorizes warm solves with the carried pivot order
(batched Newton–Schulz orthogonalization) and verifies the rank pattern
post-hoc; rejected instances fall back into the fused kernel.  These
tests drive drifting sequences — small drift (carry accepted), large
kicks (working-set changes, handover), and rank perturbations
(verification failure) — and require status equality and per-level
residual-norm parity with the XLA tier (x itself is pivot-set dependent
under degeneracy; v is not — PARITY.md criterion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lexls_tpu.lexlsi as jli
from lexls_tpu import tracker, types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.parallel import batched_initial_arrays, solve_batched
from lexls_tpu.sequence import (_device_initial_activation,
                                solve_sequence_batched,
                                solve_sequence_batched_fused)


def _level_norms(v, struct):
    out = []
    fr = 0
    dims = ([struct.d0] if struct.simple_bounds else []) + list(struct.lexlse_dims)
    for d in dims:
        out.append(np.linalg.norm(v[:, fr:fr + d], axis=1))
        fr += d
    return np.stack(out, axis=1)


def _drive(trial, kicks, B=8, loop_cap=0, shrink=(), handover_slab=0,
           tile=None, trip1_noext=False):
    rng = np.random.default_rng(900 + trial)
    n = int(rng.integers(6, 14))
    p = int(rng.integers(2, 5))
    dims = [int(rng.integers(2, 7)) for _ in range(p)]
    simple = bool(rng.random() < 0.4) and dims[0] <= n
    ranks = ([min(d, int(rng.integers(1, d + 1))) for d in dims]
             if rng.random() < 0.5 else None)
    prob = gen.random_inequality_hierarchy(
        rng, n, dims, ranks=ranks, equality_fraction=rng.random() * 0.3,
        tight_fraction=rng.random() * 0.5, simple_bounds=simple)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(
        max_number_of_factorizations=80,
        deactivate_first_wrong_sign=bool(rng.random() < 0.5))
    dt = jnp.float64
    m = prob.n_ctr
    c0, s0, n0, xz, v0 = batched_initial_arrays(prob, B, dt)

    def drift(scale):
        """Dense drift on the GENERAL rows only: simple-bounds rows are
        structural one-hot selectors (the reference stores no A for
        them, ``objective.h:36-71``) — drifting them would make the
        problem ill-posed (variable fixing vs an A row that is no
        longer a unit row), under which the active-set method's
        terminal point is not unique."""
        d = scale * rng.standard_normal(prob.A.shape)
        d[:struct.d0, :] = 0.0
        return d

    base = np.stack([prob.A + drift(5e-3) for _ in range(B)])
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, m))
    reg = jnp.asarray(prob.regularization, dt)

    st, factors = jli.solve_core_fused(
        jnp.asarray(base, dt), lbs, ubs, c0, s0, n0, xz, v0, reg,
        struct=struct, params=params, x_guess_specified=False,
        v0_specified=False, tile=B, interpret=True, return_factors=True)
    carried = tracker.bootstrap_carried(factors)
    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))
    x_prev, ct_prev = st.x, st.ctr_type
    for t, kick in enumerate(kicks):
        A_t = jnp.asarray(base + drift(kick), dt)
        c, s_, ns = act(A_t, lbs, ubs, ct_prev)
        ref = solve_batched(A_t, lbs, ubs, c, s_, ns, x_prev, v0, reg,
                            struct=struct, params=params,
                            x_guess_specified=True)
        stt, carried = tracker.solve_core_tracked(
            A_t, lbs, ubs, c, s_, ns, x_prev, v0, carried=carried,
            struct=struct, params=params, tile=tile or B, interpret=True,
            loop_cap=loop_cap, shrink=shrink, handover_slab=handover_slab,
            trip1_noext=trip1_noext)
        np.testing.assert_array_equal(
            np.asarray(stt.status), np.asarray(ref.status),
            err_msg=f"trial {trial} step {t}")
        np.testing.assert_allclose(
            _level_norms(np.asarray(stt.v), struct),
            _level_norms(np.asarray(ref.v), struct),
            atol=1e-7, err_msg=f"trial {trial} step {t}")
        x_prev, ct_prev = stt.x, stt.ctr_type


def test_cgls_batched_matches_reference_tier():
    """tracker._cgls_tikhonov_batched ≡ regularization._tikhonov_cg on
    identical level data (same frame): the hand-batched CGLS must follow
    the reference tier's iterate sequence.  Tolerance 1e-7: fixed-trip
    CGLS without reorthogonalization amplifies summation-order roundoff
    ~1e7x (vdot vs batched-sum), measured ~7e-9 at f64 on this data."""
    from lexls_tpu import regularization as R

    rng = np.random.default_rng(0)
    n, K, B = 12, 6, 5
    factor = 0.05
    params_e = T.ParametersLexLSE(
        regularization_type=T.RegularizationType.TIKHONOV_CG,
        max_number_of_CG_iterations=10)
    first_col, rank = 3, 4
    refs, A1s, Sms, svs, cks, acts = [], [], [], [], [], []
    for _ in range(B):
        lr = jnp.asarray(rng.standard_normal((K, n + 1)))
        ns = jnp.asarray(rng.standard_normal((n, n + 1)))
        refs.append(np.asarray(R._tikhonov_cg(
            params_e, lr, ns, first_col, rank, first_col + rank,
            jnp.asarray(factor), n)))
        RT, rhs_k, S, s = R._level_blocks(lr, ns, first_col, rank,
                                          first_col + rank, n)
        A1s.append(np.asarray(RT[:, :n]))
        cks.append(np.asarray(rhs_k))
        Sms.append(np.asarray(S[:, :n]))
        svs.append(np.asarray(s))
        acts.append((np.arange(n) >= first_col).astype(float))
    y = tracker._cgls_tikhonov_batched(
        jnp.asarray(np.stack(A1s)), jnp.asarray(np.stack(Sms)),
        jnp.asarray(np.stack(svs)), jnp.asarray(np.stack(cks)),
        jnp.asarray(factor), jnp.asarray(np.stack(acts)), 10)
    new_rhs = jnp.einsum("bkn,bn->bk", jnp.asarray(np.stack(A1s)), y)
    np.testing.assert_allclose(np.asarray(new_rhs), np.stack(refs),
                               atol=1e-7)


def test_default_cert_tol_dtype_aware():
    """The accepted-carry accuracy contract tracks the dtype (VERDICT
    round-4 item 1): f32 keeps the 1e-3 envelope, f64 defaults to 1e-9
    so the tracked tier meets the reference's f64 tolerances
    (``typedefs.h:118-124``) without callers plumbing cert_tol."""
    assert tracker.default_cert_tol(jnp.float32) == 1e-3
    assert tracker.default_cert_tol(jnp.bfloat16) == 1e-3
    assert tracker.default_cert_tol(jnp.float64) == 1e-9


def test_orthonormalize_z_drift_contract():
    """First-order triangular passes (round-3 contract): a DRIFT-SIZED
    E = G - I contracts quadratically per pass (1e-3 -> ~1e-9 in two),
    Z stays upper triangular (diag(R) bookkeeping), and (MZ)T(MZ) = I
    to the certificate's own bound."""
    K, B = 12, 6
    rng = np.random.default_rng(7)
    eye = np.eye(K)
    live2 = jnp.ones((B, K, K))
    for scale, bound in ((1e-4, 1e-10), (1e-3, 1e-7), (5e-3, 1e-5)):
        M = eye + scale * rng.standard_normal((B, K, K))
        G = jnp.asarray(np.swapaxes(M, 1, 2) @ M)
        Z, cert = tracker._orthonormalize_z(G, live2, passes=2)
        assert float(jnp.max(cert)) < bound, scale
        Zn = np.asarray(Z)
        np.testing.assert_allclose(Zn, np.triu(Zn), atol=0)
        MZ = M @ Zn
        err = np.max(np.abs(np.swapaxes(MZ, 1, 2) @ MZ - eye))
        assert err < 10 * bound + 1e-9, (scale, err)


@pytest.mark.parametrize("mag", (0.3, 1.0, 5.0, 20.0))
def test_orthonormalize_z_activation_spike(mag):
    """Analytic rank-1 pre-step, ACTIVATION (s=+1): G = I + uuT + drift
    is absorbed in closed form (tracker.py prefix-sum Cholesky of
    I + uuT) for spike magnitudes far beyond what the first-order
    passes alone could contract."""
    K, B = 12, 6
    rng = np.random.default_rng(11)
    eye = np.eye(K)
    u = mag * rng.standard_normal((B, K)) / np.sqrt(K)
    D = 1e-4 * rng.standard_normal((B, K, K))
    G = eye + u[:, :, None] * u[:, None, :] + D + np.swapaxes(D, 1, 2)
    Z, cert = tracker._orthonormalize_z(
        jnp.asarray(G), jnp.ones((B, K, K)), passes=2,
        u=jnp.asarray(u), s1=jnp.ones((B, 1)))
    assert float(jnp.max(cert)) < 1e-7, mag
    Zn = np.asarray(Z)
    np.testing.assert_allclose(Zn, np.triu(Zn), atol=0)
    err = np.max(np.abs(np.swapaxes(Zn, 1, 2) @ G @ Zn - eye))
    assert err < 1e-6, (mag, err)
    # without the pre-step the same spike must blow the certificate
    # (first-order passes only contract drift-sized E)
    if mag >= 1.0:
        _, cert0 = tracker._orthonormalize_z(
            jnp.asarray(G), jnp.ones((B, K, K)), passes=2)
        assert not bool(jnp.any(cert0 < 1e-3)), mag


@pytest.mark.parametrize("mag", (0.3, 0.7, 0.95))
def test_orthonormalize_z_removal_downdate(mag):
    """Closed-form Cholesky DOWNDATE (removal, s=-1): G = I - uuT +
    drift with ||u|| < 1 keeps every prefix pivot t_j positive and is
    absorbed analytically; conditioning grows like 1/(1-||u||^2) and
    the passes still certify."""
    K, B = 12, 6
    rng = np.random.default_rng(13)
    eye = np.eye(K)
    u = rng.standard_normal((B, K))
    u = mag * u / np.linalg.norm(u, axis=1, keepdims=True)
    D = 1e-6 * rng.standard_normal((B, K, K))
    G = eye - u[:, :, None] * u[:, None, :] + D + np.swapaxes(D, 1, 2)
    Z, cert = tracker._orthonormalize_z(
        jnp.asarray(G), jnp.ones((B, K, K)), passes=2,
        u=jnp.asarray(u), s1=-jnp.ones((B, 1)))
    assert float(jnp.max(cert)) < 1e-7, mag
    Zn = np.asarray(Z)
    np.testing.assert_allclose(Zn, np.triu(Zn), atol=0)
    err = np.max(np.abs(np.swapaxes(Zn, 1, 2) @ G @ Zn - eye))
    assert err < 1e-6, (mag, err)


def test_orthonormalize_z_downdate_rank_loss():
    """A downdate that destroys rank (||u|| >= 1 on some prefix, i.e. a
    square-orthonormal level losing its row) drives t_j <= 0, the sqrt
    yields NaN, and the certificate REJECTS — never a silent accept."""
    K, B = 12, 4
    rng = np.random.default_rng(17)
    eye = np.eye(K)
    for mag in (1.0, 1.2, 3.0):
        u = rng.standard_normal((B, K))
        u = mag * u / np.linalg.norm(u, axis=1, keepdims=True)
        G = eye - u[:, :, None] * u[:, None, :]
        _, cert = tracker._orthonormalize_z(
            jnp.asarray(G), jnp.ones((B, K, K)), passes=2,
            u=jnp.asarray(u), s1=-jnp.ones((B, 1)))
        assert not bool(jnp.any(cert < 1e-3)), mag  # NaN/large -> reject
    # prefix rank loss: u concentrated on an early coordinate
    u = np.zeros((B, K)); u[:, 2] = 1.05
    G = eye - u[:, :, None] * u[:, None, :]
    _, cert = tracker._orthonormalize_z(
        jnp.asarray(G), jnp.ones((B, K, K)), passes=2,
        u=jnp.asarray(u), s1=-jnp.ones((B, 1)))
    assert not bool(jnp.any(cert < 1e-3))


def test_orthonormalize_z_kappa_fallback_boundary():
    """The FALLBACK BOUNDARY (VERDICT r3 item 2): a badly conditioned
    carried frame — an unannounced structural change the first-order
    passes cannot contract — must fail the tracker's acceptance
    threshold (cert_tol = 1e-3) for every kappa >= 1e2, so the exact
    tier takes over; an exactly orthonormal frame is accepted, and a
    genuinely rank-deficient G rejects (NaN or large)."""
    K, B = 12, 6
    rng = np.random.default_rng(19)
    live2 = jnp.ones((B, K, K))
    for kappa in (1e2, 1e4, 1e6):
        Q, _ = np.linalg.qr(rng.standard_normal((K, K)))
        s = np.geomspace(1.0, 1.0 / kappa, K)
        M = np.stack([Q * s for _ in range(B)])
        G = jnp.asarray(np.swapaxes(M, 1, 2) @ M)
        _, cert = tracker._orthonormalize_z(G, live2, passes=2)
        assert not bool(jnp.any(cert < 1e-3)), kappa  # rejected
    Q, _ = np.linalg.qr(rng.standard_normal((K, K)))
    M = np.stack([Q for _ in range(B)])  # kappa = 1: accepted
    G = jnp.asarray(np.swapaxes(M, 1, 2) @ M)
    _, cert = tracker._orthonormalize_z(G, live2, passes=2)
    assert float(jnp.max(cert)) < 1e-10
    s = np.ones(K); s[-1] = 0.0  # zero singular value
    M = np.stack([Q * s for _ in range(B)])
    G = jnp.asarray(np.swapaxes(M, 1, 2) @ M)
    _, cert = tracker._orthonormalize_z(G, live2, passes=2)
    assert not bool(jnp.any(cert < 1e-3))


@pytest.mark.parametrize("trial", range(4))
def test_tracked_small_drift(trial):
    """Small drift: the carry is accepted, most instances resolve in the
    tracker; x/v and statuses must match the XLA tier."""
    _drive(trial, kicks=(0.003, 0.005, 0.004))


@pytest.mark.parametrize("trial", range(4))
def test_tracked_kicks_and_fallback(trial):
    """Large kicks force working-set changes (kernel handover) and
    verification failures (full fallback)."""
    _drive(trial, kicks=(0.05, 0.3, 0.05))


@pytest.mark.parametrize("trial,cap", [(0, 1), (1, 2), (2, 1), (3, 2)])
def test_tracked_loop_cap_handover(trial, cap):
    """Capped tracker trips: instances still alive at the cap finish in
    the fused kernel (per-instance it0 handover); results must equal the
    XLA tier regardless of where the handover lands.  Large kicks force
    multi-iteration solves so the cap actually binds."""
    _drive(trial, kicks=(0.05, 0.3, 0.05), loop_cap=cap)


@pytest.mark.parametrize("trial", range(4))
def test_tracked_trip1_noext(trial):
    """trip1_noext: the nochg trip skips the greedy-extension block —
    drift-induced rank growth then fails the trailing-column acceptance
    and finishes in the exact kernel instead of being absorbed.  Results
    must equal the XLA tier either way (correct by fallback); large
    kicks maximize rank-profile churn."""
    _drive(trial, kicks=(0.05, 0.3, 0.05), loop_cap=1, trip1_noext=True)


@pytest.mark.parametrize("trial,slab,tile", [
    (0, 4, 2), (1, 4, 4), (2, 2, 2), (3, 6, 2),
])
def test_tracked_handover_slab(trial, slab, tile):
    """Slab handover (round 5): only a leading slab of compacted
    stragglers ships to the fused kernel (``handover_slab``) — the
    permutes, kernel grid, and tri-inv bootstrap shrink to the slab.
    Results must equal the XLA tier for every slab size, including
    overflow (more stragglers than the slab → full-width branch) —
    large kicks force kernel handovers on most steps."""
    _drive(trial, kicks=(0.05, 0.3, 0.05), handover_slab=slab, tile=tile)


@pytest.mark.parametrize("trial,shrink", [
    (0, (4, 2)), (1, (4,)), (2, (6, 3, 1)), (3, (2,)),
])
def test_tracked_pyramid_shrink(trial, shrink):
    """Pyramid compaction: after the full-width trip, stragglers run on
    shrinking leading slabs (one-hot MXU permutes).  Results must be
    slab-size independent — including the deliberately undersized
    shrink=(2,) where overflow stragglers spill into the fused kernel.
    Large kicks force multi-iteration solves so every pyramid level and
    the unwind path actually execute."""
    _drive(trial, kicks=(0.05, 0.3, 0.05), shrink=shrink)


@pytest.mark.parametrize("trial,shrink,cap", [(1, (4, 2), 3), (2, (4,), 2)])
def test_tracked_pyramid_with_loop_cap(trial, shrink, cap):
    """Pyramid + loop_cap compose: the cap bounds total trips across
    pyramid levels and the finishing while-loop; capped-out slab
    instances take the fused-kernel handover."""
    _drive(trial, kicks=(0.05, 0.3, 0.05), loop_cap=cap, shrink=shrink)


def test_tracked_lambda_noise_floor_regression():
    """Regression (round-3 fuzz trial 24): a full-rank level's carried
    frame leaves ~cert·‖b‖ of noise on its structurally-zero residual;
    above tol_correct_sign_lambda (1e-12) that falsely marked rows
    CORRECT_SIGN in the removal sweep, shielding a later objective's
    genuinely wrong-sign rows — the tracker declared "solved" at a
    suboptimal endpoint (last-level norm off by 164).  The certified
    λ-noise floor in _hot_lambda fixes it."""
    _drive(24, kicks=(0.003, 0.02, 0.004))


def test_carried_error_stays_stationary_f32():
    """Regression (round-4 TPU diagnosis): ``rinv_new = rinv_old Z``
    compounds evaluation error MULTIPLICATIVELY across committed trips —
    after the cold solve's ~194 commits at f32, the exported carry
    failed the next warm solve's certificate for the entire batch.  The
    Newton inverse-refinement against the freshly measured R makes the
    error stationary: 200 successive carried re-factorizations at f32
    drift must all stay accepted."""
    rng = np.random.default_rng(3)
    n, dims = 16, [6, 5]
    prob = gen.random_inequality_hierarchy(
        rng, n, dims, equality_fraction=1.0, tight_fraction=0.0)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(tol_linear_dependence=1e-7)
    B = 4
    dt = jnp.float32
    m = prob.n_ctr
    base = np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                     for _ in range(B)]).astype(np.float32)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, m))
    ct = jnp.broadcast_to(
        jnp.asarray(jli.initial_activation(prob)[0]), (B, m))

    Ag, bg, fm, fv = jax.vmap(
        lambda a, l, u, c: jli._masked_general(a, l, u, c, struct)
    )(jnp.asarray(base, dt), lbs, ubs, ct)
    Agz = jnp.where(fm[:, None, :], 0.0, Ag)
    st, factors = jli.solve_core_fused(
        jnp.asarray(base, dt), lbs, ubs, ct,
        jnp.zeros((B, m), jnp.int32), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, n), dt), jnp.zeros((B, m), dt),
        jnp.asarray(prob.regularization, dt), struct=struct,
        params=params, x_guess_specified=False, v0_specified=False,
        tile=B, interpret=True, return_factors=True)
    car = tracker.bootstrap_carried(factors)
    rinv, pos, ranks = car.rinv, car.pos, car.ranks
    Agz0 = Agz
    with jax.default_matmul_precision("float32"):
        for t in range(200):
            d = jnp.asarray(
                1e-3 * rng.standard_normal(Agz.shape), dt)
            # bounded wander around the base problem: consecutive
            # factorizations differ by ~2e-3 (absorbable drift) but the
            # pivot pattern never genuinely changes
            Agz = Agz0 + jnp.where(Agz0 == 0.0, 0.0, d)
            ok, _, _, pos, ranks, rinv, why = tracker._factorize_carried(
                Agz, bg, rinv, pos, ranks, struct, params,
                ns_iters=2, cert_tol=1e-3, ext_steps=1)
            assert bool(jnp.all(ok)), f"carry rejected at trip {t}, " \
                f"why={np.asarray(why)}"


def _controlled_setup():
    """Two 6-row general levels over n=20 (full-rank, no degeneracy):
    the carried-factorization acceptance should survive single
    working-set changes without falling back."""
    rng = np.random.default_rng(2)
    n = 20
    prob = gen.random_inequality_hierarchy(
        rng, n, [6, 6], equality_fraction=0.0, tight_fraction=0.0)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(tol_linear_dependence=1e-7)
    dt = jnp.float64
    B, m = 1, prob.n_ctr
    As = jnp.asarray(prob.A[None], dt)
    lbs = jnp.asarray(prob.lb[None], dt)
    ubs = jnp.asarray(prob.ub[None], dt)
    return rng, n, prob, struct, params, dt, B, m, As, lbs, ubs


def _masked(As, lbs, ubs, ct, struct):
    Ag, bg, fm, fv = jax.vmap(
        lambda a, l, u, cc: jli._masked_general(a, l, u, cc, struct)
    )(As, lbs, ubs, ct)
    Agz = jnp.where(fm[:, None, :], 0.0, Ag)
    bgz = bg - jnp.einsum("bmn,bn->bm", Ag, fv)
    return Agz, bgz


def test_carried_absorbs_activation_below_levels():
    """Round-4: a working-set ACTIVATION at level 0 changes the Gauss
    elimination into level 1 by exactly rank one; without absorbing it,
    level 1's carried frame fails the cert and the instance falls back
    (TPU diagnosis: EVERY working-set change fell).  With the
    kernel-direction rank-1 identification the whole carried trip must
    be ACCEPTED (ok=True) and the extension must add the new pivot."""
    (rng, n, prob, struct, params, dt, B, m, As, lbs, ubs) = \
        _controlled_setup()
    ACT, INA = int(T.CtrType.ACTIVE_LB), int(T.CtrType.INACTIVE)
    ct0 = np.full((B, m), INA, np.int32)
    ct0[:, :5] = ACT
    ct0[:, 6:12] = ACT
    ct0 = jnp.asarray(ct0)
    f = jax.vmap(lambda a, l, u, c: jli._factorize(
        a, l, u, c, struct, params, jnp.zeros(2, dt)))(As, lbs, ubs, ct0)
    car = tracker.carried_from_lexqr(f, struct)
    assert np.asarray(car.ranks).tolist() == [[5, 6]]

    ct1 = ct0.at[:, 5].set(ACT)
    Agz, bgz = _masked(As, lbs, ubs, ct1, struct)
    mg = Agz.shape[1]
    row_hot = jnp.broadcast_to(
        (jnp.arange(mg)[None, :] == 5), (B, mg)).astype(dt)
    ok, _, _, pos, ranks, rinv, why = tracker._factorize_carried(
        Agz, bgz, car.rinv, car.pos, car.ranks, struct, params,
        ns_iters=2, cert_tol=1e-3, ext_steps=1,
        chg=(Agz[:, 5, :], row_hot, jnp.zeros((B, 1), jnp.int32),
             jnp.ones((B, 1), dt), jnp.zeros((B, mg), dt),
             jnp.zeros((B, n + 1), dt)))
    assert bool(jnp.all(ok)), f"why={np.asarray(why)}"
    assert np.asarray(ranks).tolist() == [[6, 6]]
    # without the chg identification the same trip must be REJECTED
    # (otherwise this test would not prove the absorption does anything)
    ok2, *_ = tracker._factorize_carried(
        Agz, bgz, car.rinv, car.pos, car.ranks, struct, params,
        ns_iters=2, cert_tol=1e-3, ext_steps=1)
    assert not bool(jnp.any(ok2))


def test_carried_absorbs_removal_below_levels():
    """The removal dual: deleting the changed level's last pivot
    (rank decrement + pos renumber) plus absorbing the DISAPPEARING
    Gauss elimination (carried c_rm/w_rm from the committing trip's
    factors) keeps the whole carried trip accepted."""
    (rng, n, prob, struct, params, dt, B, m, As, lbs, ubs) = \
        _controlled_setup()
    ACT, INA = int(T.CtrType.ACTIVE_LB), int(T.CtrType.INACTIVE)
    ct1 = np.full((B, m), INA, np.int32)
    ct1[:, :6] = ACT
    ct1[:, 6:12] = ACT
    ct1 = jnp.asarray(ct1)
    f = jax.vmap(lambda a, l, u, c: jli._factorize(
        a, l, u, c, struct, params, jnp.zeros(2, dt)))(As, lbs, ubs, ct1)
    car = tracker.carried_from_lexqr(f, struct)
    assert np.asarray(car.ranks).tolist() == [[6, 6]]

    # one carried trip on the SAME working set yields the stash (Q, W,
    # Lp) the body would have saved at the committing trip
    Agz1, bgz1 = _masked(As, lbs, ubs, ct1, struct)
    mg = Agz1.shape[1]
    zeros_chg = (jnp.zeros((B, n), dt), jnp.zeros((B, mg), dt),
                 jnp.full((B, 1), -1, jnp.int32), jnp.zeros((B, 1), dt),
                 jnp.zeros((B, mg), dt), jnp.zeros((B, n + 1), dt))
    ok0, stash, fcs, pos, ranks, rinv, _ = tracker._factorize_carried(
        Agz1, bgz1, car.rinv, car.pos, car.ranks, struct, params,
        ns_iters=2, cert_tol=1e-3, ext_steps=1, chg=zeros_chg)
    assert bool(jnp.all(ok0))

    # remove row 5: carried bookkeeping exactly as the body commits it
    iota_k = jnp.arange(car.rinv.shape[-1])
    Q0, W0, Lp0 = stash[0][1], stash[0][2], stash[0][4]
    sel = (iota_k[None, :] == 5).astype(dt)
    z = Q0[:, 5, :]                       # row 5's Q-frame coordinates
    zs = jnp.sum(z * sel, axis=1, keepdims=True)
    c_rm0 = jnp.einsum("bmk,bk->bm", Lp0, z) / zs
    c_rm = jnp.zeros((B, mg), dt).at[:, 6:].set(c_rm0)
    w_rm = jnp.einsum("bkc,bk->bc", W0, sel)
    row_hot = jnp.broadcast_to(
        (jnp.arange(mg)[None, :] == 5), (B, mg)).astype(dt)
    pos_d, ranks_d = tracker._delete_last_pivot(pos, ranks, row_hot,
                                                struct)
    assert np.asarray(ranks_d).tolist() == [[5, 6]]

    ct0 = ct1.at[:, 5].set(INA)
    Agz0, bgz0 = _masked(As, lbs, ubs, ct0, struct)
    a_row = jnp.einsum("bm,bmn->bn", row_hot, Agz1)
    ok, _, _, pos2, ranks2, rinv2, why = tracker._factorize_carried(
        Agz0, bgz0, rinv, pos_d, ranks_d, struct, params,
        ns_iters=2, cert_tol=1e-3, ext_steps=1,
        chg=(a_row, row_hot, jnp.zeros((B, 1), jnp.int32),
             -jnp.ones((B, 1), dt), c_rm, w_rm))
    assert bool(jnp.all(ok)), f"why={np.asarray(why)}"
    assert np.asarray(ranks2).tolist() == [[5, 6]]


def test_tracked_exact_trajectory_small_drift():
    """On accepted carries the working-set trajectory itself matches the
    from-scratch solver (same pivot sets => same x => same ratio tests).

    x on an accepted carry is exact to ~cert·kappa: the acceptance
    tolerance is the accuracy contract, so this test pins cert_tol to
    1e-9 — carries above it fall to the exact tier and the assert stays
    sharp (at the default 1e-3 a marginal-but-accepted frame may carry
    ~1e-5 into x, which is within the TRACKED tier's documented
    envelope but not "exact")."""
    rng = np.random.default_rng(42)
    prob = gen.random_inequality_hierarchy(
        rng, 12, [5, 5, 5], equality_fraction=0.15, tight_fraction=0.35)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(max_number_of_factorizations=80)
    B, dt = 8, jnp.float64
    m = prob.n_ctr
    c0, s0, n0, xz, v0 = batched_initial_arrays(prob, B, dt)
    base = np.stack([prob.A + 2e-3 * rng.standard_normal(prob.A.shape)
                     for _ in range(B)])
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, m))
    reg = jnp.asarray(prob.regularization, dt)
    st, factors = jli.solve_core_fused(
        jnp.asarray(base, dt), lbs, ubs, c0, s0, n0, xz, v0, reg,
        struct=struct, params=params, x_guess_specified=False,
        v0_specified=False, tile=B, interpret=True, return_factors=True)
    carried = tracker.bootstrap_carried(factors)
    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))
    x_prev, ct_prev = st.x, st.ctr_type
    for t in range(3):
        A_t = jnp.asarray(base + 1e-3 * (t + 1)
                          * rng.standard_normal(prob.A.shape), dt)
        c, s_, ns = act(A_t, lbs, ubs, ct_prev)
        ref = solve_batched(A_t, lbs, ubs, c, s_, ns, x_prev, v0, reg,
                            struct=struct, params=params,
                            x_guess_specified=True)
        stt, carried = tracker.solve_core_tracked(
            A_t, lbs, ubs, c, s_, ns, x_prev, v0, carried=carried,
            struct=struct, params=params, tile=B, interpret=True,
            cert_tol=1e-9)
        np.testing.assert_array_equal(np.asarray(stt.status),
                                      np.asarray(ref.status))
        np.testing.assert_array_equal(np.asarray(stt.it), np.asarray(ref.it))
        np.testing.assert_array_equal(np.asarray(stt.ctr_type),
                                      np.asarray(ref.ctr_type))
        np.testing.assert_allclose(np.asarray(stt.x), np.asarray(ref.x),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(stt.v), np.asarray(ref.v),
                                   atol=1e-8)
        x_prev, ct_prev = stt.x, stt.ctr_type


def test_sequence_batched_fused_and_tracked():
    """The library sequence drivers (fused tier, VERDICT round-2 item 3)
    match the vmapped XLA sequence driver."""
    rng = np.random.default_rng(11)
    prob = gen.random_inequality_hierarchy(
        rng, 10, [4, 4, 4], equality_fraction=0.15, tight_fraction=0.4)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(max_number_of_factorizations=80)
    B, Tn, dt = 4, 5, jnp.float64
    m = prob.n_ctr
    A_seq = jnp.asarray(np.stack([
        np.stack([prob.A + 3e-3 * (t + 1) * rng.standard_normal(prob.A.shape)
                  for t in range(Tn)]) for _ in range(B)]), dt)
    lb_seq = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, Tn, m))
    ub_seq = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, Tn, m))
    reg = jnp.asarray(prob.regularization, dt)
    ref = solve_sequence_batched(A_seq, lb_seq, ub_seq, reg,
                                 struct=struct, params=params)
    for tracked in (False, True):
        out = solve_sequence_batched_fused(
            A_seq, lb_seq, ub_seq, reg, struct=struct, params=params,
            tile=B, interpret=True, vmem_limit_mb=0, compact=1,
            tracked=tracked)
        np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
        # x via the NS-orthogonalized carried factors rounds differently
        # than via Householder (same pivot sets): ~1e-7 at f64
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   atol=1e-6)


@pytest.mark.parametrize("trial", range(3))
def test_cold_tracked_matches_xla(trial):
    """Cold solves through the tracker loop (one exact kernel iteration,
    then every remaining iteration as batched matmuls with greedy
    extension): statuses and per-level residual norms match the XLA
    tier across ~10-40-iteration cold trajectories."""
    rng = np.random.default_rng(300 + trial)
    n = int(rng.integers(8, 16))
    p = int(rng.integers(2, 5))
    dims = [int(rng.integers(3, 7)) for _ in range(p)]
    simple = bool(rng.random() < 0.4) and dims[0] <= n
    prob = gen.random_inequality_hierarchy(
        rng, n, dims, equality_fraction=rng.random() * 0.2,
        tight_fraction=0.3 + rng.random() * 0.3, simple_bounds=simple)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(max_number_of_factorizations=80)
    B, dt = 6, jnp.float64
    m = prob.n_ctr
    c0, s0, n0, xz, v0 = batched_initial_arrays(prob, B, dt)
    As = np.stack([prob.A.copy() for _ in range(B)])
    for b in range(B):
        d = 1e-2 * rng.standard_normal(prob.A.shape)
        d[:struct.d0] = 0
        As[b] += d
    As = jnp.asarray(As, dt)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, m))
    reg = jnp.asarray(prob.regularization, dt)
    ref = solve_batched(As, lbs, ubs, c0, s0, n0, xz, v0, reg,
                        struct=struct, params=params,
                        x_guess_specified=False)
    stt, _ = tracker.solve_core_cold_tracked(
        As, lbs, ubs, c0, s0, n0, xz, v0, struct=struct, params=params,
        tile=B, interpret=True)
    np.testing.assert_array_equal(np.asarray(stt.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(
        _level_norms(np.asarray(stt.v), struct),
        _level_norms(np.asarray(ref.v), struct), atol=1e-7)


@pytest.mark.parametrize("trial,reg_type", [
    (0, T.RegularizationType.TIKHONOV),
    (1, T.RegularizationType.TIKHONOV),
    (2, T.RegularizationType.TIKHONOV),
    # TIKHONOV_CG: the tracker's in-loop damped solve runs the same
    # fixed-trip CGLS as the XLA tier (frame-invariant Krylov iterates,
    # tracker._cgls_tikhonov_batched)
    (0, T.RegularizationType.TIKHONOV_CG),
    (1, T.RegularizationType.TIKHONOV_CG),
])
def test_reg_tracked_cold(trial, reg_type):
    """Regularized (TIKHONOV / TIKHONOV_CG) tracker on the config-3
    shape: statuses match the XLA tier, and every tracker-solved
    endpoint is a FIXED POINT of the reference iteration (one
    `_verify_working_set` from the endpoint declares solved with no
    working-set change and unchanged v).  Under regularization the
    active-set method is heuristic — rank-deficient tie-breaks
    legitimately diverge between arithmetic paths — so terminal-point
    validity, not norm equality, is the criterion (the reference itself
    can cycle here, which is why cycling handling exists,
    ``cycling.h``)."""
    import dataclasses as dc

    from lexls_tpu.lexlsi import _verify_working_set

    rng = np.random.default_rng(500 + trial)
    dims = [6, 5, 5, 4, 4, 4]
    rks = [4, 3, 3, 2, 2, 2]
    prob = gen.random_inequality_hierarchy(rng, 24, dims, ranks=rks,
                                           equality_fraction=0.1)
    prob.regularization = np.full(6, 0.05)
    struct = jli.Structure.of(prob)
    params = T.ParametersLexLSI(
        regularization_type=reg_type,
        max_number_of_factorizations=64)
    B, dt = 6, jnp.float64
    m = prob.n_ctr
    c0, s0, n0, xz, v0 = batched_initial_arrays(prob, B, dt)
    As = jnp.asarray(np.stack([
        prob.A + 1e-2 * rng.standard_normal(prob.A.shape)
        for _ in range(B)]), dt)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dt), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dt), (B, m))
    reg = jnp.asarray(prob.regularization, dt)
    ref = solve_batched(As, lbs, ubs, c0, s0, n0, xz, v0, reg,
                        struct=struct, params=params,
                        x_guess_specified=False)
    stt, car = tracker.solve_core_cold_tracked(
        As, lbs, ubs, c0, s0, n0, xz, v0, struct=struct, params=params,
        tile=B, interpret=True, reg=reg)
    np.testing.assert_array_equal(np.asarray(stt.status),
                                  np.asarray(ref.status))
    for b in range(B):
        if int(stt.status[b]) != 0:
            continue
        sb = jax.tree_util.tree_map(lambda a: a[b], stt)
        sb = dc.replace(sb, status=jnp.zeros((), jnp.int32) - 1)
        s1 = _verify_working_set(sb, As[b], struct, params, reg)
        assert int(s1.status) == 0, (trial, b)
        np.testing.assert_array_equal(np.asarray(s1.ctr_type),
                                      np.asarray(sb.ctr_type))
        # fixed-point v tolerance: the direct TIKHONOV y* is the exact
        # damped minimizer (frame-robust, 1e-7); the truncated-CG y* is
        # a fixed-trip Krylov iterate WITHOUT reorthogonalization, whose
        # sensitivity to summation-order roundoff alone is ~1e7x
        # (measured: identical inputs, vdot vs batched-sum order,
        # 7e-9 at f64), so the ~1e-9-certified carried frame lands at
        # ~1e-4 — that is CG truncation sensitivity, not tracker error.
        v_tol = (1e-3 if reg_type == T.RegularizationType.TIKHONOV_CG
                 else 1e-7)
        assert float(jnp.max(jnp.abs(s1.v - sb.v))) < v_tol, (trial, b)
