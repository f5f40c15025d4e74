"""Unit tests: line search, L-BFGS, CG, Lanczos vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lorads_tpu.alg import cg as cg_mod
from lorads_tpu.alg import state as st
from lorads_tpu.alg.lanczos import lanczos_min_eig
from lorads_tpu.alg.linesearch import alm_line_search, cubic_roots


# ---------------------------------------------------------------------------
# Cubic roots / line search.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("coeffs", [
    (1.0, -6.0, 11.0, -6.0),     # roots 1,2,3 (delta<0 three real)
    (1.0, 0.0, 0.0, -8.0),       # single real root 2 (delta>0)
    (1.0, -2.0, 1.0, 0.0),       # roots 0,1,1 (delta==0 double root)
    (2.0, 3.0, -11.0, -6.0),     # roots 1.5, -2, -0.5
])
def test_cubic_roots_match_numpy(coeffs):
    a, b, c, d = coeffs
    roots, num = cubic_roots(*map(jnp.float64, coeffs))
    roots = np.asarray(roots)[: int(num)]
    true = np.roots([a, b, c, d])
    true = np.sort(true[np.abs(true.imag) < 1e-9].real)
    # every returned root must be a root of the cubic
    for r in roots:
        val = a * r**3 + b * r**2 + c * r + d
        assert abs(val) < 1e-6 * max(1, abs(r)) ** 3
    # the largest real root must be among them (reference picks via min phi)
    assert np.min(np.abs(roots[:, None] - true[None, :])) < 1e-8


def test_line_search_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(20):
        m = 7
        rho = float(rng.uniform(0.5, 50))
        lam = rng.standard_normal(m)
        q0 = rng.standard_normal(m)
        q1 = rng.standard_normal(m)
        q2 = rng.standard_normal(m)
        p1 = float(rng.standard_normal())
        p2 = float(rng.standard_normal())

        tau, num = alm_line_search(
            jnp.float64(rho), jnp.asarray(lam), jnp.float64(p1),
            jnp.float64(p2), jnp.asarray(q0), jnp.asarray(q1),
            jnp.asarray(q2))
        assert int(num) > 0
        # oracle: dense scan of the quartic
        q0s = q0 + lam / rho
        a = rho * (q2 @ q2) / 2
        b = rho * (q1 @ q2)
        c = p2 - rho * (q0s @ q2) + rho * (q1 @ q1) / 2
        d = p1 - rho * (q0s @ q1)
        ts = np.linspace(0, 1, 200001)
        phi = a * ts**4 + b * ts**3 + c * ts**2 + d * ts
        t_best = ts[np.argmin(phi)]
        phi_tau = (a * float(tau)**4 + b * float(tau)**3
                   + c * float(tau)**2 + d * float(tau))
        assert phi_tau <= phi.min() + 1e-8 * (1 + abs(phi.min()))
        del t_best


# ---------------------------------------------------------------------------
# L-BFGS two-loop vs dense BFGS-free oracle.
# ---------------------------------------------------------------------------

def _np_two_loop(grad, S, Y):
    """Oracle two-loop with H0 = I, newest first in S/Y lists."""
    q = grad.copy()
    alphas = []
    for s, y in zip(S, Y):
        rho_ = 1.0 / (y @ s)
        a = rho_ * (s @ q)
        q -= a * y
        alphas.append((a, rho_))
    for (a, rho_), s, y in zip(reversed(alphas), reversed(S), reversed(Y)):
        b = rho_ * (y @ q)
        q += (a - b) * s
    return -q


def test_lbfgs_direction_matches_oracle():
    rng = np.random.default_rng(1)
    B, n, r = 2, 5, 3
    L = 2

    def mk():
        return st.FactorVec(
            (jnp.asarray(rng.standard_normal((B, n, r))),),
            jnp.asarray(rng.standard_normal(4)))

    hist = st.make_history(mk(), L)
    pairs = []
    for _ in range(3):  # overfill the circular buffer
        s, y = mk(), mk()
        hist = st.history_push(hist, s, y)
        pairs.append((s, y))
    grad = mk()

    d = st.lbfgs_direction(hist, grad)

    def flat(v):
        return np.concatenate([np.asarray(v.cones[0]).ravel(),
                               np.asarray(v.lp).ravel()])

    S = [flat(pairs[2][0]), flat(pairs[1][0])]   # newest first, window L=2
    Y = [flat(pairs[2][1]), flat(pairs[1][1])]
    expect = _np_two_loop(flat(grad), S, Y)
    got = flat(d)
    if expect @ flat(grad) >= 0:  # safeguard would trigger
        expect = -flat(grad)
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)


def test_lbfgs_no_history_is_steepest_descent():
    g = st.FactorVec((jnp.ones((1, 2, 2)),), jnp.ones(3))
    hist = st.make_history(g, 2)
    d = st.lbfgs_direction(hist, g)
    np.testing.assert_allclose(np.asarray(d.cones[0]), -1.0)
    np.testing.assert_allclose(np.asarray(d.lp), -1.0)


# ---------------------------------------------------------------------------
# Batched CG.
# ---------------------------------------------------------------------------

def test_batched_cg_solves_spd_systems():
    rng = np.random.default_rng(2)
    B, n, r = 3, 6, 2
    mats = []
    for _ in range(B):
        A = rng.standard_normal((n * r, n * r))
        mats.append(A @ A.T + 5 * np.eye(n * r))
    As = jnp.asarray(np.stack(mats))
    b = rng.standard_normal((B, n, r))

    def op(x):
        xf = x.reshape(B, n * r)
        return jnp.einsum("bij,bj->bi", As, xf).reshape(B, n, r)

    x, iters = cg_mod.cg_solve(op, jnp.zeros((B, n, r)), jnp.asarray(b),
                               1e-12, 500)
    for i in range(B):
        expect = np.linalg.solve(mats[i], b[i].ravel())
        np.testing.assert_allclose(np.asarray(x[i]).ravel(), expect,
                                   rtol=1e-6, atol=1e-8)


def test_cg_ir_matches_f64_cg_to_tolerance():
    """Mixed-precision iterative-refinement CG (cg_solve_ir): f32
    inner sweeps + f64 residual refinement must reach the SAME f64
    stopping criterion ||r||_2/||b||_1 < tol as the all-f64 solve —
    far below what a pure-f32 CG can reach."""
    rng = np.random.default_rng(7)
    B, n, r = 2, 8, 3
    mats = []
    for _ in range(B):
        A = rng.standard_normal((n * r, n * r))
        mats.append(A @ A.T + 3 * np.eye(n * r))
    A64 = jnp.asarray(np.stack(mats))
    A32 = A64.astype(jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, n, r)))

    def mk(M):
        def op(x):
            xf = x.reshape(B, n * r)
            return jnp.einsum("bij,bj->bi", M, xf).reshape(B, n, r)
        return op

    tol = 1e-11
    x, iters = cg_mod.cg_solve_ir(mk(A64), mk(A32),
                                  jnp.zeros((B, n, r)), b, tol, 500)
    res = np.asarray(mk(A64)(x) - b)
    for i in range(B):
        rel = np.linalg.norm(res[i]) / np.abs(np.asarray(b[i])).sum()
        assert rel < tol
    # and it genuinely used the f32 path (some inner iterations ran)
    assert int(iters) > 0


def test_cg_warm_start_converges_immediately():
    rng = np.random.default_rng(3)
    B, n, r = 1, 4, 2
    A = rng.standard_normal((n * r, n * r))
    A = A @ A.T + np.eye(n * r)

    def op(x):
        return jnp.einsum("ij,bj->bi", jnp.asarray(A),
                          x.reshape(B, -1)).reshape(B, n, r)

    x_true = rng.standard_normal((B, n, r))
    b = np.asarray(op(jnp.asarray(x_true)))
    x, iters = cg_mod.cg_solve(op, jnp.asarray(x_true), jnp.asarray(b),
                               1e-10, 100)
    assert int(iters) == 0


# ---------------------------------------------------------------------------
# Lanczos min-eig.
# ---------------------------------------------------------------------------

def test_lanczos_min_eig_batched():
    rng = np.random.default_rng(4)
    B, n = 3, 40
    mats, expect = [], []
    for i in range(B):
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        evals = np.sort(rng.uniform(-5, 5, n))
        mats.append(Q @ np.diag(evals) @ Q.T)
        expect.append(evals[0])
    As = jnp.asarray(np.stack(mats))

    def mv(x):
        return jnp.einsum("bij,bj->bi", As, x)

    v0 = jnp.asarray(rng.standard_normal((B, n)))
    lams = np.asarray(lanczos_min_eig(mv, v0, k=30, restarts=3))
    np.testing.assert_allclose(lams, expect, rtol=1e-2, atol=1e-3)


def test_lanczos_adaptive_clustered_spectrum():
    """VERDICT r1 #4 regression: a tiny negative lambda_min buried in
    a near-zero cluster on an O(1)-norm operator (the theta slack
    profile, n > 1024).  The round-1 fixed 2x36-step sweep is >2x
    optimistic here; the adaptive restart-until-Ritz-residual variant
    (ARPACK dsaupd tol semantics, lorads_sdp_conic.c:1286-1349) must
    land within 10% — without the dense-eigh rescue (n > 1024)."""
    from lorads_tpu.alg.lanczos import _min_ritz, lanczos_min_eig_device

    n = 1500
    rng = np.random.default_rng(0)
    evals = np.sort(np.concatenate([
        [-1e-5], rng.uniform(-8e-6, 1e-4, 800),
        rng.uniform(0.1, 1.0, n - 801)]))
    d = jnp.asarray(evals)
    mv = lambda x: d[None, :] * x
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal((1, n)))

    # the old behavior: exactly two fixed 36-step restarts
    v = v0
    for _ in range(2):
        lam_old, v, _ = _min_ritz(mv, v, 36)
    lam_new = float(lanczos_min_eig_device(mv, v0)[0][0])
    true = float(evals[0])
    assert float(lam_old[0]) > true / 2           # old: >2x optimistic
    assert abs(lam_new - true) <= 0.1 * abs(true)  # new: within 10%


def test_lanczos_f32_sweep_f64_rayleigh_refinement():
    """The tiered certificate (f64-escalated solves): the restart loop
    runs at f32 with the eigenvalue refined by one f64 Rayleigh
    quotient (matvec_hi).  The refined value must match the true f64
    lambda_min far tighter than the raw f32 sweep value — the squared
    angle-error property the certificate relies on."""
    from lorads_tpu.alg.lanczos import lanczos_min_eig_device

    rng = np.random.default_rng(11)
    n = 300
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    evals = np.sort(np.concatenate([[-3.7e-4],
                                    rng.uniform(1e-3, 1.0, n - 1)]))
    A = Q @ np.diag(evals) @ Q.T
    A64 = jnp.asarray(A)                      # x64 on (conftest)
    A32 = A64.astype(jnp.float32)

    mv_hi = lambda x: jnp.einsum("bij,bj->bi", A64[None], x)
    mv_lo = lambda x: jnp.einsum("bij,bj->bi", A32[None], x)
    v0 = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)

    lam, _ = lanczos_min_eig_device(mv_lo, v0, matvec_hi=mv_hi)
    lam = float(lam[0])
    assert lam >= evals[0] - 1e-12            # Rayleigh quotient bound
    assert abs(lam - evals[0]) <= 2e-2 * abs(evals[0])


def test_densify_w_matches_dense_oracle():
    """densify_w materializes sparse-mode build_w output exactly (the
    small-sparse-slack eigh rescue depends on it)."""
    from lorads_tpu.alg import aop
    from lorads_tpu.alg.solver import LoradsSolver
    from lorads_tpu.io import generators
    from lorads_tpu.ops import pattern as pat
    from lorads_tpu import LoradsParams

    problem = generators.maxcut(n=300, avg_degree=6, seed=3)
    s = LoradsSolver(problem, LoradsParams(verbose=False, dtype="f64"))
    bk = s.pd.buckets[0]
    assert not bk.dense
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(problem.m))
    W = pat.build_w(bk, pat.gather_w(bk, w))
    Wd = np.asarray(pat.densify_w(bk, W))[0]
    # oracle: C + sum_i w_i A_i densely
    blk = problem.blocks[0]
    full = np.zeros((blk.dim, blk.dim))
    for r, c, v in zip(blk.obj_row, blk.obj_col, blk.obj_val):
        full[r, c] += v
        if r != c:
            full[c, r] += v
    for i, r, c, v in zip(blk.a_con, blk.a_row, blk.a_col, blk.a_val):
        full[r, c] += w[i] * v
        if r != c:
            full[c, r] += w[i] * v
    np.testing.assert_allclose(Wd, full, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(Wd, Wd.T, atol=0)


def test_lbfgs_compact_matches_twoloop():
    """Compact-representation direction == two-loop recursion."""
    import jax.numpy as jnp
    from lorads_tpu.alg import state as st
    rng = np.random.default_rng(11)
    fv = lambda: st.FactorVec(
        (jnp.asarray(rng.standard_normal((1, 12, 4))),),
        jnp.asarray(rng.standard_normal(3)))
    for n_push in (0, 1, 2, 3, 5):
        hist = st.make_history(fv(), 3)
        for _ in range(n_push):
            hist = st.history_push(hist, fv(), fv())
        g = fv()
        d1 = st.lbfgs_direction_twoloop(hist, g)
        d2 = st.lbfgs_direction_compact(hist, g)
        for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-10)


def test_admm_chunk_memoized_across_solvers():
    """Equal params must reuse the SAME jitted chunk callable: a fresh
    jax.jit per solver re-traces the ADMM graph every solve (~1s host
    overhead on ADMM-heavy families)."""
    from lorads_tpu.alg import admm as admm_mod
    from lorads_tpu.config import LoradsParams
    p1 = LoradsParams(verbose=False)
    p2 = LoradsParams(verbose=True)       # verbose is not baked in
    assert admm_mod.make_admm_chunk(p1, False) is admm_mod.make_admm_chunk(
        p2, False)
    assert admm_mod.make_admm_chunk(p1, True) is admm_mod.make_admm_chunk(
        p1, True)
    p3 = LoradsParams(phase2_tol=3e-7)    # baked-in field -> new chunk
    assert admm_mod.make_admm_chunk(p3, False) is not \
        admm_mod.make_admm_chunk(p1, False)
