"""Phase I — Augmented Lagrangian Method on the single factor R.

minimize  <C, RR^T> - lambda^T (A(RR^T) - b) + (rho/2) ||A(RR^T) - b||^2

by L-BFGS directions + exact quartic line search.  Device/host split:

* the inner L-BFGS loop runs entirely on device as a lax.while_loop
  (`inner_chunk`), up to ~800 steps per dispatch;
* dual updates, the rho escalation do-while, and objective/DIMACS
  refreshes are small jitted calls;
* adaptive outer control (EMA stagnation, difficulty grading, rank
  flags, reopt variants) stays in host Python, mirroring
  LORADS_ALMOptimize (/root/reference/src_semi/lorads_alg/lorads_alm.c:991-1255)
  and LORADS_ALMOptimize_reopt (lorads_alm.c:745-987).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lorads_tpu.alg import aop
from lorads_tpu.alg.aop import ProblemData
from lorads_tpu.alg.linesearch import alm_line_search
from lorads_tpu.alg.state import (FactorVec, LBFGSHistory, fv_norm2sq,
                                  history_push, history_reset,
                                  lbfgs_direction)

EASY, MEDIUM, HARD, SUPER = 0, 1, 2, 3


@dataclasses.dataclass
class ALMStats:
    """Host-side mutable ALM iteration state (lorads_alm_state analogue,
    /root/reference/src_semi/data/def_lorads_solver.h + lorads_solver.c:1119)."""

    rho: float
    outer_iter: int = 0
    inner_iter: int = 0
    pobj: float = 1e30
    dobj: float = 1e30
    pinf_l1: float = 1e30
    pinf_inf: float = 1e30
    gap: float = 1e30
    tau: float = 0.0


# ---------------------------------------------------------------------------
# Jitted pieces.
# ---------------------------------------------------------------------------

@jax.jit
def alm_recompute(pd: ProblemData, R: FactorVec, dual, rho):
    """Fresh A(RR^T), gradient and certificate value (ALG_START,
    lorads_alm.c:1010-1014)."""
    _, total = aop.auv(pd, R, R)
    w = rho * (total - pd.rhs) - dual
    g = aop.grad(pd, R, w)
    cert = jnp.sqrt(fv_norm2sq(g)) / (1.0 + pd.c_nrm_inf)
    return total, g, cert


@jax.jit
def alm_dual_and_grad(pd: ProblemData, R: FactorVec, dual, constr_sum, rho):
    """lambda += rho (b - A(X)); then grad/cert at the new dual
    (lorads_alm.c:1151-1153)."""
    dual_n = dual + rho * (pd.rhs - constr_sum)
    w = rho * (constr_sum - pd.rhs) - dual_n
    g = aop.grad(pd, R, w)
    cert = jnp.sqrt(fv_norm2sq(g)) / (1.0 + pd.c_nrm_inf)
    return dual_n, g, cert


@jax.jit
def alm_update_rho(pd: ProblemData, R: FactorVec, dual, constr_sum, rho,
                   factor, grad0: FactorVec):
    """do { rho *= factor; recompute grad } while (0.1/rho >= cert)
    (UpdateRho, lorads_alm.c:1174-1180)."""

    def body(c):
        rho_, _, _ = c
        rho_n = rho_ * factor
        w = rho_n * (constr_sum - pd.rhs) - dual
        g = aop.grad(pd, R, w)
        cert = jnp.sqrt(fv_norm2sq(g)) / (1.0 + pd.c_nrm_inf)
        return rho_n, g, cert

    c = body((rho, grad0, jnp.zeros_like(rho)))
    c = jax.lax.while_loop(lambda c: 0.1 / c[0] >= c[2], body, c)
    return c


@jax.jit
def alm_obj_dimacs(pd: ProblemData, R: FactorVec, dual, scale):
    """pObj, dObj, fresh constr_sum, pinf_l1, gap
    (calObj_alm + LORADSCalDualObj + updateDimacsALM)."""
    pobj = aop.obj_only(pd, R, R) / scale
    dobj = jnp.vdot(pd.rhs, dual) / scale
    _, total = aop.auv(pd, R, R)
    pinf = aop.primal_infeas_l1(pd, total)
    gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
    return pobj, dobj, total, pinf, gap


@partial(jax.jit, static_argnames=("check_pinf_conv", "refresh_every"))
def inner_chunk(pd: ProblemData, R: FactorVec, grad: FactorVec,
                hist: LBFGSHistory, dual, constr_sum, cert_val, rho,
                cert_tol, end_sub_tol, end_tau_tol, phase1_tol, gap_ok,
                max_local, check_pinf_conv: bool = True,
                refresh_every: int = 25):
    """The inner L-BFGS loop (lorads_alm.c:1073-1150) as one device loop.

    Exits when: certificate satisfied, local iteration cap, tau too
    small, line-search failure, or (init phase only) primal
    infeasibility below phase1Tol.
    """
    pinf_scale = (1.0 + pd.b_nrm1) / (1.0 + pd.b_nrm_inf)

    def conv(pinf_l1):
        if not check_pinf_conv:
            return jnp.asarray(False)
        return (pinf_l1 * pinf_scale <= phase1_tol) & gap_ok

    def cond(carry):
        (R_, g_, h_, cs_, cert_, pinf_, it, tau, num_err, tau_small) = carry
        return ((cert_ - cert_tol > end_sub_tol)
                & (it < max_local)
                & (~num_err) & (~tau_small)
                & (~conv(pinf_)))

    def body(carry):
        (R_, g_, h_, cs_, cert_, pinf_, it, _, _, _) = carry
        h_ = jax.lax.cond(it % 300 == 0, history_reset, lambda h: h, h_)
        D = lbfgs_direction(h_, g_)
        q0 = pd.rhs - cs_
        p1, q1, p2, q2 = aop.obj_and_auv_pair(pd, R_, D)
        p1, q1 = 2.0 * p1, 2.0 * q1
        tau, num = alm_line_search(rho, dual, p1, p2, q0, q1, q2)
        num_err = num == 0
        tau_small = (~num_err) & (jnp.abs(tau) < end_tau_tol)
        ok = (~num_err) & (~tau_small)

        def do_update(_):
            y0 = g_.scale(-1.0)
            Rn = R_.axpy(tau, D)
            cs_inc = cs_ + tau * q1 + (tau * tau) * q2
            w = rho * (cs_inc - pd.rhs) - dual
            gn = aop.grad(pd, Rn, w)
            hn = history_push(h_, D.scale(tau), y0 + gn)
            # The reference recomputes A(RR^T) fresh every inner
            # iteration (updateDimacsALM, lorads_alm.c:1128-1130); the
            # incremental sum cs_inc is exact in exact arithmetic, so
            # we keep it and refresh only every `refresh_every` steps
            # for floating-point hygiene — one A-pass saved per step.
            total = jax.lax.cond(
                it % refresh_every == refresh_every - 1,
                lambda _: aop.auv(pd, Rn, Rn)[1],
                lambda _: cs_inc, None)
            pinf = aop.primal_infeas_l1(pd, total)
            certn = jnp.sqrt(fv_norm2sq(gn)) / (1.0 + pd.c_nrm_inf)
            return Rn, gn, hn, total, certn, pinf

        def no_update(_):
            return R_, g_, h_, cs_, cert_, pinf_

        Rn, gn, hn, csn, certn, pinfn = jax.lax.cond(
            ok, do_update, no_update, None)
        return (Rn, gn, hn, csn, certn, pinfn, it + 1, tau,
                num_err, tau_small)

    pinf0 = aop.primal_infeas_l1(pd, constr_sum)
    carry = (R, grad, hist, constr_sum, cert_val, pinf0,
             jnp.zeros((), jnp.int32), jnp.zeros_like(rho),
             jnp.asarray(False), jnp.asarray(False))
    carry = jax.lax.while_loop(cond, body, carry)
    (R, grad, hist, constr_sum, cert_val, pinf_l1, it, tau,
     num_err, tau_small) = carry
    return (R, grad, hist, constr_sum,
            dict(cert_val=cert_val, pinf_l1=pinf_l1, local_iter=it,
                 tau=tau, num_err=num_err, tau_small=tau_small))


# ---------------------------------------------------------------------------
# Host-side EMA stagnation detector.
# ---------------------------------------------------------------------------

class EmaDetector:
    """Reference LUtilUpdateCheckEma (lorads_utils.c:404-434)."""

    def __init__(self, alpha=0.1, threshold=0.005, interval=5):
        self.alpha = alpha
        self.threshold = threshold
        self.interval = interval
        self.current = 0.0
        self.old = 0.0
        self.counter = 1

    def update(self, value: float) -> bool:
        result = True
        self.current = self.alpha * value + (1 - self.alpha) * self.current
        if self.counter >= self.interval:
            if self.old != 0.0:
                change = (self.current - self.old) / self.old
                result = -self.threshold <= change <= self.threshold
            self.old = self.current
            self.counter = 1
        else:
            self.counter += 1
        return result


# ---------------------------------------------------------------------------
# Host driver.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ALMResult:
    action: str              # "done" | "aug_rank" | "num_err" | "time_out"
    R: FactorVec
    dual: jnp.ndarray
    hist: LBFGSHistory
    constr_sum: jnp.ndarray


def alm_optimize(pd: ProblemData, params, R: FactorVec, dual, hist,
                 stats: ALMStats, scale_obj: float, is_rank_max: bool,
                 rho_update_factor: float, time_solve_start: float,
                 solver_ctx, reopt: bool = False,
                 early_stop: bool = True,
                 max_alm_iter: Optional[int] = None,
                 log=print) -> ALMResult:
    """Full ALM phase.  Mirrors LORADS_ALMOptimize (init) and
    LORADS_ALMOptimize_reopt control flow.

    ``solver_ctx`` carries the cross-call MAX_ALM_SUB_ITER global
    (reference file-scope int, lorads_alm.c:7) as attribute
    ``max_alm_sub_iter``.
    """
    t0 = time.time()
    if max_alm_iter is None:
        max_alm_iter = params.max_alm_iter
    if not reopt:
        solver_ctx.max_alm_sub_iter = 5000
    max_sub_iter_inc, max_sub_iter_ceil = 10000, 25000
    update_max_sub_counter = 0
    last_outer_start = 1
    rank_flag = 0
    rank_flag_thres = params.rank_flag_thres
    rank_update_factor = 1.5
    if not reopt:
        rho_update_factor = params.alm_rho_factor
    rho_factor_flag = 0
    k0 = stats.outer_iter

    constr_sum, grad, cert_val = alm_recompute(pd, R, dual, stats.rho)
    cert_val = float(cert_val)
    cert_tol = 0.1 / stats.rho
    difficulty = HARD

    def finalize(action: str) -> ALMResult:
        pobj, dobj, total, pinf, gap = alm_obj_dimacs(pd, R, dual, scale_obj)
        stats.pobj, stats.dobj = float(pobj), float(dobj)
        stats.pinf_l1, stats.gap = float(pinf), float(gap)
        stats.pinf_inf = stats.pinf_l1 * (1 + pd.b_nrm1) / (1 + pd.b_nrm_inf)
        log(f"Exit ALM: OuterIter:{stats.outer_iter} "
            f"InnerIter:{stats.inner_iter} pObj:{stats.pobj:5.5e} "
            f"dObj:{stats.dobj:5.5e} pInf(1):{stats.pinf_l1:5.5e} "
            f"pdGap:{stats.gap:5.5e} rho:{stats.rho:3.2f} "
            f"Time:{time.time() - t0:3.2f}")
        return ALMResult(action, R, dual, hist, total)

    k = stats.outer_iter
    while True:
        if reopt:
            if k > max_alm_iter and (
                    stats.pinf_inf <= params.phase1_tol
                    and (stats.gap <= max(params.phase1_tol,
                                          params.phase2_tol * 5)
                         or not params.high_acc_mode)):
                break
        else:
            if k > max_alm_iter:
                break
        ema = EmaDetector()
        cur_iter_counter = 1
        if update_max_sub_counter >= 2:
            update_max_sub_counter = 0
            solver_ctx.max_alm_sub_iter = min(
                solver_ctx.max_alm_sub_iter + max_sub_iter_inc,
                max_sub_iter_ceil)

        local_iter = 0
        best_cert_pass = float("inf")
        cert_no_improve = 0
        while difficulty != EASY:
            # f32 floor guard (no reference counterpart, which is f64):
            # the EMA treats a stagnant certificate as "keep iterating",
            # which livelocks when the gradient norm sits at the float32
            # noise floor.  If whole passes stop improving the
            # certificate, more L-BFGS steps at this rho are useless.
            if cert_val < best_cert_pass * 0.99:
                best_cert_pass = cert_val
                cert_no_improve = 0
            else:
                cert_no_improve += 1
                if cert_no_improve >= 3:
                    break
            if_continue = ema.update(cert_val)
            if not if_continue and not params.high_acc_mode:
                break
            if cur_iter_counter >= solver_ctx.max_alm_sub_iter:
                update_max_sub_counter += 1
                break
            if (rank_flag >= rank_flag_thres and not is_rank_max
                    and k - last_outer_start >= 3):
                break
            if cert_val <= cert_tol:
                break

            gap_ok = (not params.high_acc_mode) or (
                stats.gap <= params.phase1_tol)
            (R, grad, hist, constr_sum, info) = inner_chunk(
                pd, R, grad, hist, dual, constr_sum,
                jnp.asarray(cert_val, pd.rhs.dtype), jnp.asarray(stats.rho),
                jnp.asarray(cert_tol), jnp.asarray(params.end_alm_sub_tol),
                jnp.asarray(params.end_tau_tol),
                jnp.asarray(params.phase1_tol), jnp.asarray(gap_ok),
                jnp.asarray(801, jnp.int32),
                check_pinf_conv=not reopt)
            # one blocking transfer for all chunk scalars (device->host
            # round-trips are expensive on remote/tunneled backends)
            info = jax.device_get(info)
            local_iter = int(info["local_iter"])
            stats.inner_iter += local_iter
            cur_iter_counter += local_iter
            cert_val = float(info["cert_val"])
            stats.pinf_l1 = float(info["pinf_l1"])
            stats.pinf_inf = stats.pinf_l1 * (1 + pd.b_nrm1) / (
                1 + pd.b_nrm_inf)
            stats.tau = float(info["tau"])

            if bool(info["num_err"]):
                return finalize("num_err")
            if bool(info["tau_small"]):
                log(f"update rho since tau is too small: {stats.tau:5.3e}")
                break
            if (not reopt) and stats.pinf_inf <= params.phase1_tol and (
                    stats.gap <= params.phase1_tol
                    or not params.high_acc_mode):
                stats.outer_iter = k
                return finalize("done")

            # dual ascent + fresh gradient (lorads_alm.c:1151-1153)
            dual, grad, cert = alm_dual_and_grad(
                pd, R, dual, constr_sum, jnp.asarray(stats.rho))
            cert_val = float(cert)

            # difficulty grading (lorads_alm.c:1154-1171)
            if local_iter <= 20:
                difficulty = EASY
                rank_flag = 0
            elif local_iter <= 100:
                difficulty = MEDIUM
                rank_flag += 2
            elif local_iter < 400 or reopt:
                difficulty = HARD
                rank_flag += 3
            else:
                difficulty = SUPER
                rank_flag += 4

        # UpdateRho (lorads_alm.c:1174-1190)
        rho_n, grad, cert = alm_update_rho(
            pd, R, dual, constr_sum, jnp.asarray(stats.rho),
            jnp.asarray(rho_update_factor), grad)
        stats.rho = float(rho_n)
        cert_val = float(cert)
        cert_tol = 0.1 / stats.rho
        if stats.rho >= 5e4 and rho_factor_flag < 4:
            rho_update_factor = rho_update_factor ** 0.25
            rho_factor_flag = 4
        elif stats.rho >= 5e6 and rho_factor_flag < 6:
            rho_update_factor = rho_update_factor ** 0.25
            rho_factor_flag = 6
        elif stats.rho >= 5e8 and rho_factor_flag < 8:
            rho_update_factor = rho_update_factor ** 0.25
            rho_factor_flag = 8
        difficulty = HARD
        hist = history_reset(hist)
        k += 1
        stats.outer_iter = k

        # outer-iteration bookkeeping + termination
        if not reopt:
            if stats.pinf_inf <= params.phase1_tol and (
                    stats.gap <= params.phase1_tol
                    or not params.high_acc_mode):
                return finalize("done")
        pobj, dobj, total, pinf, gap = alm_obj_dimacs(
            pd, R, dual, jnp.asarray(scale_obj))
        constr_sum = total
        pobj, dobj, pinf, gap = jax.device_get((pobj, dobj, pinf, gap))
        stats.pobj, stats.dobj = float(pobj), float(dobj)
        stats.pinf_l1, stats.gap = float(pinf), float(gap)
        stats.pinf_inf = stats.pinf_l1 * (1 + pd.b_nrm1) / (1 + pd.b_nrm_inf)
        if reopt:
            if early_stop:
                if (stats.pinf_l1 <= params.phase1_tol
                        and stats.gap <= max(params.phase1_tol,
                                             params.phase2_tol * 5)
                        and k - k0 > 1):
                    return finalize("done")
            else:
                if (stats.gap <= params.phase2_tol
                        and stats.pinf_l1 <= params.phase2_tol
                        and k - k0 > 1):
                    return finalize("done")
        else:
            if (stats.gap <= params.phase1_tol * 1e-3
                    and stats.pinf_l1 <= params.phase1_tol * 1e-3):
                return finalize("done")
        log(f"ALM Outer:{stats.outer_iter} Inner:{stats.inner_iter} "
            f"pObj:{stats.pobj:5.5e} dObj:{stats.dobj:5.5e} "
            f"pInf(1):{stats.pinf_l1:5.5e} pInf(Inf):{stats.pinf_inf:5.5e} "
            f"pdGap:{stats.gap:5.5e} rho:{stats.rho:3.2f} "
            f"Time:{time.time() - t0:3.2f}")
        if time.time() - time_solve_start >= params.time_sec_limit:
            return finalize("time_out")

        # dynamic rank augmentation trigger (lorads_alm.c:1227-1236)
        cones_ok = True if not reopt else (pd.n_buckets <= 10)
        if rank_flag >= rank_flag_thres and not is_rank_max and cones_ok:
            rank_flag = 0
            if k - last_outer_start >= 2:
                stats.outer_iter = k
                return ALMResult("aug_rank", R, dual, hist, constr_sum)

    return finalize("done")
