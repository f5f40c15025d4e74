"""Closed-form Sherman-Morrison ADMM update vs the generic CG path.

Diag-identity cones (A_i = a_i e_i e_i^T) give a row-decoupled normal
system solved exactly without CG (alg/admm.py).  These tests pin the
closed form to (a) the generic CG path at tight tolerance and (b) a
dense NumPy row-by-row linear solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lorads_tpu import LoradsParams
from lorads_tpu.alg import admm as admm_mod
from lorads_tpu.alg.admm import _update_sdp_var_one
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.core.problem import SDPBlockData, SDPProblem
from lorads_tpu.io import generators
from lorads_tpu.ops import pattern as pat


def _weighted_diag_problem(n=128, seed=0):
    """min <C, X> s.t. a_i X_ii = b_i with non-unit a_i.

    Sparse enough (union density < 0.1) that presolve picks the
    split/sparse mode where the diag-identity fast path lives.
    """
    rng = np.random.default_rng(seed)
    # random sparse symmetric C (off-diag + diag entries)
    k = 2 * n
    r = rng.integers(0, n, k)
    c = rng.integers(0, n, k)
    lo, hi = np.minimum(r, c), np.maximum(r, c)
    v = rng.standard_normal(k)
    a = rng.uniform(0.5, 2.0, n)
    blk = SDPBlockData(
        dim=n, m=n,
        obj_row=hi.astype(np.int32), obj_col=lo.astype(np.int32),
        obj_val=v,
        a_con=np.arange(n, dtype=np.int32),
        a_row=np.arange(n, dtype=np.int32),
        a_col=np.arange(n, dtype=np.int32),
        a_val=a,
    )
    return SDPProblem(m=n, rhs=np.ones(n), blocks=[blk])


@pytest.mark.parametrize("problem_fn", [
    lambda: generators.maxcut(n=200, avg_degree=4, seed=2),
    _weighted_diag_problem,
])
def test_closed_form_matches_cg(problem_fn, monkeypatch):
    problem = problem_fn()
    solver = LoradsSolver(problem, LoradsParams(verbose=False))
    pd = solver.pd
    bk = pd.buckets[0]
    assert bk.diag_ident and not bk.has_off_a, "test needs the fast path"

    rng = np.random.default_rng(7)
    n, r = solver.U.cones[0].shape[1:]
    U = jnp.asarray(rng.standard_normal((1, n, r)))
    V = jnp.asarray(rng.standard_normal((1, n, r)))
    dual = jnp.asarray(rng.standard_normal(pd.rhs.shape))
    rho = jnp.asarray(3.7, pd.rhs.dtype)
    vals = pat.constr_vals(bk, pat.uvt(bk, U, V))
    total = pat.scatter_constr(bk, vals)

    out_closed = _update_sdp_var_one(pd, bk, U, V, vals, total, dual,
                                     rho, 1e-14, 2000)
    monkeypatch.setattr(admm_mod, "_CLOSED_FORM", False)
    out_cg = _update_sdp_var_one(pd, bk, U, V, vals, total, dual,
                                 rho, 1e-14, 2000)
    np.testing.assert_allclose(np.asarray(out_closed[0]),
                               np.asarray(out_cg[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_closed[2]),
                               np.asarray(out_cg[2]), atol=1e-8)
    assert int(out_closed[3]) == 0  # no CG iterations


def test_closed_form_solves_normal_equations():
    """new_var satisfies (I + a_i^2 v_i v_i^T) x_i = rhs_i row by row."""
    problem = _weighted_diag_problem(n=96, seed=3)
    solver = LoradsSolver(problem, LoradsParams(verbose=False))
    pd = solver.pd
    bk = pd.buckets[0]
    rng = np.random.default_rng(11)
    n, r = solver.U.cones[0].shape[1:]
    U = jnp.asarray(rng.standard_normal((1, n, r)))
    V = jnp.asarray(rng.standard_normal((1, n, r)))
    dual = jnp.asarray(rng.standard_normal(pd.rhs.shape))
    rho = jnp.asarray(2.3, pd.rhs.dtype)
    vals = pat.constr_vals(bk, pat.uvt(bk, U, V))
    total = pat.scatter_constr(bk, vals)

    new_var, new_local, new_sum, iters, _ = _update_sdp_var_one(
        pd, bk, U, V, vals, total, dual, rho, 1e-14, 2000)

    # rebuild rhs on host exactly as _update_sdp_var_one does
    base = np.asarray(rho * (total - pd.rhs) - dual)
    w_loc = np.asarray(pat.gather_w(bk, jnp.asarray(base))
                       - rho * pat.cone_total(bk, vals))
    W = pat.build_w(bk, jnp.asarray(w_loc))
    fcache = pat.gather_cache(bk, V)
    M2 = np.asarray(pat.w_mul_cached(bk, W, V, fcache)
                    - rho * V)
    rhs = -M2 / float(rho)

    a = np.asarray(bk.a_val_d)[0]
    Vn = np.asarray(V)[0]
    got = np.asarray(new_var)[0]
    for i in range(n):
        A_i = np.eye(r) + (a[i] ** 2) * np.outer(Vn[i], Vn[i])
        want = np.linalg.solve(A_i, rhs[0, i])
        np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_mixed_diag_off_constraint_not_misclassified():
    """A constraint holding its diag-identity entry PLUS off-diagonal
    entries must not enable the diag-fast paths (regression: the
    diag_ident detection used to ignore off constraint entries, which
    would have dropped the off adjoint from gradients and the ADMM
    closed form)."""
    from lorads_tpu.alg import aop

    n = 128
    rng = np.random.default_rng(4)
    k = n  # sparse C
    r = rng.integers(0, n, k)
    c = rng.integers(0, n, k)
    lo, hi = np.minimum(r, c), np.maximum(r, c)
    # constraint 0: X_00 + X_10 = 1; constraints i>=1: X_ii = 1
    a_con = np.concatenate([[0], np.arange(n)]).astype(np.int32)
    a_row = np.concatenate([[1], np.arange(n)]).astype(np.int32)
    a_col = np.concatenate([[0], np.arange(n)]).astype(np.int32)
    a_val = np.ones(n + 1)
    blk = SDPBlockData(
        dim=n, m=n,
        obj_row=hi.astype(np.int32), obj_col=lo.astype(np.int32),
        obj_val=rng.standard_normal(k),
        a_con=a_con, a_row=a_row, a_col=a_col, a_val=a_val)
    problem = SDPProblem(m=n, rhs=np.ones(n), blocks=[blk])
    solver = LoradsSolver(problem, LoradsParams(verbose=False))
    bk = solver.pd.buckets[0]
    assert not bk.diag_ident
    assert not aop._diag_fast(bk)

    # gradient parity vs the dense oracle 2 (C + A^*(w)) R
    pd, R = solver.pd, solver.R
    w = jnp.asarray(rng.standard_normal(n))
    g = aop.grad(pd, R, w)
    C = problem.blocks[0].dense_obj()
    Astar = np.zeros((n, n))
    wn = np.asarray(w)
    for i in range(n):
        A_i = problem.blocks[0].dense_constr(i)
        Astar += wn[i] * A_i
    want = 2.0 * (C + Astar) @ np.asarray(R.cones[0])[0]
    np.testing.assert_allclose(np.asarray(g.cones[0])[0], want,
                               rtol=1e-9, atol=1e-9)


def test_maxcut_end_to_end_with_closed_form():
    problem = generators.maxcut(n=300, avg_degree=4, seed=9)
    res = LoradsSolver(problem, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5
    assert res.gap <= 5e-5
