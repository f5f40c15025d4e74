"""Dual certificate repair (LoradsParams.dual_repair).

When a block's constraint span contains its identity, a negative
slack eigenvalue is removed exactly by shifting the dual along that
direction.  These tests pin the direction detection, the exclusivity
guard, and the end-to-end repair (slack verified PSD by dense eigh).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lorads_tpu import LoradsParams
from lorads_tpu.alg.admm import ADMMStats
from lorads_tpu.alg.solver import LoradsSolver, _find_identity_direction
from lorads_tpu.core.problem import LPBlockData, SDPBlockData, SDPProblem
from lorads_tpu.io import generators


def test_direction_detection_maxcut_diag_family():
    problem = generators.maxcut(n=50, avg_degree=4, seed=1)
    s = LoradsSolver(problem, LoradsParams(verbose=False))
    dirs = s._identity_directions()
    assert len(dirs) == 1 and dirs[0] is not None
    slots, coefs = dirs[0]
    np.testing.assert_array_equal(np.sort(slots), np.arange(50))
    np.testing.assert_allclose(coefs, 1.0)


def test_direction_detection_theta_trace():
    problem = generators.lovasz_theta(n=30, avg_degree=5, seed=2)
    s = LoradsSolver(problem, LoradsParams(verbose=False))
    dirs = s._identity_directions()
    assert dirs[0] is not None
    slots, coefs = dirs[0]
    assert slots.size == 1          # the trace constraint
    assert slots[0] == problem.m - 1
    np.testing.assert_allclose(coefs, 1.0)


def test_direction_detection_none_for_matcomp():
    problem = generators.matrix_completion(n1=16, n2=16, true_rank=2,
                                           frac_obs=0.4, seed=3)
    s = LoradsSolver(problem, LoradsParams(verbose=False))
    # matcomp has a trace constraint? if none of the directions apply
    # the list holds None entries and repair is a no-op
    dirs = s._identity_directions()
    assert isinstance(dirs, list)


def test_exclusivity_guard_lp_shared_constraint():
    """A trace constraint whose row also touches the LP block must be
    rejected (shifting it would perturb the LP dual slack)."""
    n = 8
    blk = SDPBlockData(
        dim=n, m=1,
        obj_row=np.arange(n, dtype=np.int32),
        obj_col=np.arange(n, dtype=np.int32),
        obj_val=-np.ones(n),
        a_con=np.zeros(n, dtype=np.int32),
        a_row=np.arange(n, dtype=np.int32),
        a_col=np.arange(n, dtype=np.int32),
        a_val=np.ones(n))
    lp = LPBlockData(
        n_cols=2, m=1, obj=np.ones(2),
        a_con=np.zeros(2, dtype=np.int32),
        a_col=np.arange(2, dtype=np.int32),
        a_val=np.ones(2))
    problem = SDPProblem(m=1, rhs=np.ones(1), blocks=[blk], lp=lp)
    s = LoradsSolver(problem, LoradsParams(verbose=False))
    assert s._identity_directions() == [None]
    shared = np.zeros(1, dtype=bool)
    shared[np.unique(lp.a_con)] = True
    assert _find_identity_direction(blk, shared) is None
    # without the LP usage the same block IS a trace direction
    assert _find_identity_direction(blk, np.zeros(1, dtype=bool)) \
        is not None


def test_repair_restores_dual_feasibility_maxcut():
    problem = generators.maxcut(n=150, avg_degree=4, seed=5)
    s = LoradsSolver(problem, LoradsParams(verbose=False))
    # corrupt the dual: lambda = 0 leaves S = C = -L/4 with
    # lam_min = -lam_max(L)/4 < 0 (definitely infeasible)
    s.dual = jnp.zeros_like(s.dual)
    s.pobj, s.dobj = -1.0, 0.0
    stats = ADMMStats(rho=1.0, pobj=-1.0)
    dinf = s.dual_infeasibility(stats=stats)

    lam = np.asarray(s.dual, dtype=np.float64)
    C = problem.blocks[0].dense_obj()
    S = C - np.diag(lam)
    evals = np.linalg.eigvalsh(S)
    assert evals.min() >= -1e-6 * max(1.0, abs(evals).max())
    # the reported dinf was RE-measured post-shift
    assert dinf <= 1e-5
    # dObj refreshed to b . lambda
    assert stats.dobj == pytest.approx(float(lam.sum()), rel=1e-9)


def test_repair_off_reports_violation():
    problem = generators.maxcut(n=150, avg_degree=4, seed=5)
    s = LoradsSolver(problem, LoradsParams(verbose=False,
                                           dual_repair=False))
    s.dual = jnp.zeros_like(s.dual)
    dinf = s.dual_infeasibility()
    assert dinf > 1e-4  # honest: S = C is not PSD
    assert float(jnp.sum(jnp.abs(s.dual))) == 0.0  # untouched


def test_high_acc_repair_never_leaves_classification_band():
    """Regression: in high_acc_mode the repair trigger band is
    phase2_tol but status classification keeps the reference's
    5*phase2_tol bands (main.c:478-487).  A repair on a solve whose
    gap ALREADY passes classification (gap <= 5*tol) must not fire
    when the dObj shift would push the gap out of that band —
    previously the "gap was failing the (tighter) repair band anyway"
    waiver let it through and downgraded OPTIMAL runs to MAXITER."""
    problem = generators.maxcut(n=50, avg_degree=4, seed=1)
    s = LoradsSolver(problem, LoradsParams(verbose=False,
                                           high_acc_mode=True))
    norm = s.scale_obj_his * (s.pd.c_nrm1 + 1.0)
    # dinf fails the high-acc band (2e-5 > 1e-5) but would pass the
    # 5e-5 classification band; gap_now = 3e-5 passes classification
    val = 2e-5 * norm
    lams = [np.asarray([-val])]
    s.pobj = 1.0
    d = 1.0 - 3e-5 * (2.0 + 1.0)  # gap_now ~ 3e-5
    s.dual = jnp.full((problem.m,), d / problem.m, dtype=s.dtype)
    assert s._repair_plan(0.0, lams) is None
    # when the gap genuinely fails classification (1e-2 > 5e-5) the
    # waiver still applies and the repair fires
    s.dual = jnp.full((problem.m,), 0.97 / problem.m, dtype=s.dtype)
    assert s._repair_plan(0.0, lams) is not None


def test_theta_solve_with_repair_still_optimal():
    problem = generators.lovasz_theta(n=40, avg_degree=6, seed=7)
    res = LoradsSolver(problem, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5
    assert res.gap <= 5e-5
    assert res.dinf_l1 <= 5e-5
    # the REPORTED dinf is an honest certificate of the returned dual:
    # recompute it densely and require consistency (the Lanczos value
    # may under-estimate |lam_min|, hence the 3x + absolute slack)
    lam = np.asarray(res.dual, dtype=np.float64)
    blk = problem.blocks[0]
    S = blk.dense_obj().copy()
    for k in range(problem.m):
        S -= lam[k] * blk.dense_constr(k)
    evals = np.linalg.eigvalsh(S)
    # the reference metric counts the min eigenvalue per cone
    # (ARPACK "SA"), normalized by 1 + ||C||_1
    dinf_dense = abs(min(evals.min(), 0.0)) / (
        1.0 + np.abs(blk.dense_obj()).sum())
    assert dinf_dense <= 3.0 * max(res.dinf_l1, 1e-5) + 1e-7


def test_dual_refine_b_orthogonal_recovers_dinf():
    """Direct dual refinement (alg/dualrefine.py): from a near-optimal
    primal/dual pair whose dual has been perturbed b-ORTHOGONALLY into
    infeasibility, the projected CGNR must recover dinf within the
    acceptance band while leaving dObj (hence the gap) unchanged —
    the theta-profile failure mode (VERDICT r2 #2)."""
    problem = generators.maxcut(n=80, avg_degree=5, seed=7)
    params = LoradsParams(verbose=False, time_sec_limit=120.0)
    s = LoradsSolver(problem, params)
    res = s.solve()
    band = 5 * params.phase2_tol
    assert res.dinf_l1 <= band          # clean baseline

    # b-orthogonal noise on the dual: dObj unchanged, slack corrupted
    rng = np.random.default_rng(3)
    p = rng.standard_normal(s.pd.m)
    b = np.asarray(s.pd.rhs, np.float64)
    p -= (b @ p) / (b @ b) * b
    scale = 2e-3 * max(1.0, float(np.abs(np.asarray(s.dual)).max()))
    s.dual = s.dual + jnp.asarray(scale * p, s.dual.dtype)

    stats = ADMMStats(rho=1.0)
    dinf0 = s.dual_infeasibility(stats=stats, repair=False)
    stats.dinf_l1 = dinf0
    stats.gap = s.gap
    assert dinf0 > band                 # perturbation did corrupt it

    dobj_before = float(jnp.vdot(s.pd.rhs, s.dual)) / s.scale_obj_his
    ok = s._try_dual_refine(stats)
    assert ok, f"refine rejected (dinf0={dinf0:.2e})"
    assert stats.dinf_l1 <= band
    # b-orthogonality: dObj moved by nothing (up to rounding)
    assert stats.dobj == pytest.approx(dobj_before, abs=1e-8)
