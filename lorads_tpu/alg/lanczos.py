"""Batched Lanczos smallest-eigenvalue estimation.

Replaces the reference's only non-BLAS native dependency: ARPACK
dsaupd_/dseupd_ ("SA", ncv=40, tol=1e-2, maxit=600) used for the dual
infeasibility certificate lambda_min(C - A^*(lambda))
(/root/reference/src_semi/data/lorads_sdp_conic.c:1286-1349).

Design: the k-step full-reorthogonalization sweep (all matvecs) runs
on device as one jitted fori_loop batched over the bucket axis; the
k x k tridiagonal eigenproblem and the Ritz-restart logic run on host
in float64 — it is O(k^2) work at termination time, and keeping it off
the accelerator avoids a slow batched-eigh compile and any f32
degradation of the certificate itself.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _bnorm(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def _sweep(matvec: Callable, v0: jnp.ndarray, k: int):
    """One k-step Lanczos sweep with full reorthogonalization.

    v0: [B, n].  Returns (alphas [k, B], betas [k, B], Vs [k, B, n],
    alive [B, 1]); alpha slots after a breakdown hold +1e30 so the
    dead tail never contributes the minimum.
    """
    B, n = v0.shape
    dt = v0.dtype
    BIG = jnp.asarray(1e30, dt)

    v = v0 / jnp.maximum(_bnorm(v0), 1e-30)
    Vs = jnp.zeros((k, B, n), dt)
    alphas = jnp.full((k, B), BIG)
    betas = jnp.zeros((k, B), dt)
    alive = jnp.ones((B, 1), dt)

    def step(j, carry):
        v, v_prev, beta_prev, Vs, alphas, betas, alive = carry
        w = matvec(v)
        a = jnp.sum(w * v, axis=-1)
        w = w - a[:, None] * v - beta_prev * v_prev
        coef = jnp.einsum("kbn,bn->kb", Vs, w)
        w = w - jnp.einsum("kbn,kb->bn", Vs, coef)
        b = _bnorm(w)
        alive_next = alive * (b[:, 0:1] > 1e-12).astype(dt)
        v_next = jnp.where(b > 1e-30, w / jnp.maximum(b, 1e-30), 0.0)
        Vs = Vs.at[j].set(v * alive)
        alphas = alphas.at[j].set(jnp.where(alive[:, 0] > 0, a, BIG))
        betas = betas.at[j].set(
            jnp.where(alive_next[:, 0] > 0, b[:, 0], 0.0))
        return (v_next, v, b, Vs, alphas, betas, alive_next)

    carry = (v, jnp.zeros_like(v), jnp.zeros((B, 1), dt),
             Vs, alphas, betas, alive)
    carry = jax.lax.fori_loop(0, k, step, carry)
    _, _, _, Vs, alphas, betas, alive = carry
    return alphas, betas, Vs, alive


lanczos_sweep = partial(jax.jit, static_argnames=("matvec", "k"))(_sweep)


def lanczos_min_eig(matvec: Callable, v0: jnp.ndarray, k: int = 36,
                    restarts: int = 2) -> np.ndarray:
    """Smallest eigenvalue per block.  Host-side restarts + f64 eigh
    of the tridiagonal T; device-side sweeps."""
    B, n = v0.shape
    k = min(k, n)
    v = v0
    lam = np.zeros(B)
    for _ in range(restarts):
        alphas, betas, Vs, _ = lanczos_sweep(matvec, v, k)
        al = np.asarray(alphas, dtype=np.float64)     # [k, B]
        be = np.asarray(betas, dtype=np.float64)
        Vs_h = np.asarray(Vs)                         # [k, B, n]
        ritz = np.zeros((B, n), dtype=Vs_h.dtype)
        for b in range(B):
            T = np.diag(al[:, b])
            if k > 1:
                off = be[:-1, b]
                T += np.diag(off, 1) + np.diag(off, -1)
            evals, evecs = np.linalg.eigh(T)
            lam[b] = evals[0]
            ritz[b] = np.einsum("kn,k->n", Vs_h[:, b, :], evecs[:, 0])
        v = jnp.asarray(ritz, dtype=v0.dtype)
    return lam


def _min_ritz(matvec: Callable, v: jnp.ndarray, k: int):
    """One k-step sweep + tridiagonal eigh: smallest Ritz value, its
    Ritz vector, and the residual bound ||A u - lam u|| = beta_k |s_k|
    (exact for a Lanczos Ritz pair under full reorthogonalization).

    Breakdown slots are re-pointed at alpha_0 (a Rayleigh quotient,
    >= lambda_min) with zero coupling instead of the +1e30 sentinel —
    an in-range duplicate eigenvalue keeps the batched f32/f64 eigh
    well conditioned without affecting the minimum; the dead tail has
    zero eigenvector weight so the residual estimate stays valid.
    """
    alphas, betas, Vs, _ = _sweep(matvec, v, k)
    al = alphas.T                                  # [B, k]
    al = jnp.where(al >= 1e29, al[:, 0:1], al)
    be = betas.T[:, : max(k - 1, 0)]               # [B, k-1]
    T = (jax.vmap(jnp.diag)(al)
         + jax.vmap(lambda b: jnp.diag(b, 1))(be)
         + jax.vmap(lambda b: jnp.diag(b, -1))(be))
    evals, evecs = jnp.linalg.eigh(T)
    lam = evals[:, 0]
    s = evecs[:, :, 0]                             # [B, k]
    resid = betas[k - 1].T * jnp.abs(s[:, k - 1])  # [B]
    v_next = jnp.einsum("kbn,bk->bn", Vs, s)
    return lam, v_next, resid


# jitted Ritz step for host-driven restart loops (profiling tools)
min_ritz = partial(jax.jit, static_argnames=("matvec", "k"))(_min_ritz)


def lanczos_min_eig_device(matvec: Callable, v0: jnp.ndarray,
                           k: int = 36, tol: float = 1e-2,
                           maxit: int = 600, matvec_hi: Callable = None,
                           return_vec: bool = False):
    """Fully on-device ADAPTIVE variant: sweeps + batched k x k
    tridiagonal eigh + Ritz restarts inside a while_loop, no host
    round-trips.  For use INSIDE a jitted caller (no closure-keyed jit
    cache entries; the whole dual certificate stays one dispatch).

    Restart-until-converged replaces the fixed double restart: keep
    restarting from the smallest Ritz vector until the Ritz residual
    meets ARPACK's stopping rule ||A u - lam u|| <= tol * |lam|
    (dsaupd "SA" tol semantics, lorads_sdp_conic.c:1306: tol=1e-2) on
    EVERY block, bounded by ceil(maxit / k) restarts (ARPACK maxit
    600).  Fixes the round-1 soft spot where clustered spectra left
    the 2-restart Ritz value up to ~25x optimistic.

    The caller pre-normalizes the operator to max|W| = 1, so Ritz
    values are O(1) or below.  Two supplements keep the cost bounded
    where the pure relative rule cannot fire:

    * |lam| -> 0 (PSD-or-nearly slack): residuals under ``floor``
      (1e-6 at f64 — an eigenvalue error invisible to any dinf band
      after the 1/(1+||C||_1) normalization; 3e-5 at f32, just above
      the f32 sweep's rounding noise) count as converged.
    * POSITIVITY bound: a Ritz pair certifies lam_min >= lam - resid,
      and dinf only counts min(lam_min, 0) — once lam - resid >=
      -tol*floor the block's contribution is provably negligible and
      further refinement of a POSITIVE eigenvalue is wasted matvecs.
      Without this, every certified-optimal solve (slack PSD, the
      common case) would burn the full maxit budget.
    * VALUE convergence by GEOMETRIC EXTRAPOLATION: restart-to-restart
      Ritz steps decay geometrically (step ratio q measured in-loop);
      the predicted remaining drift step * q/(1-q) (q capped at 0.9)
      under tol/2 * |lam| means the VALUE has converged even when the
      residual can't reach the band (small-|lam| blocks at f32, where
      the band floors at the sweep's rounding noise — without a value
      exit a certified Max-Cut slack grinds to maxit).  Extrapolated
      remaining drift — not the raw step — is the probe: a raw-step
      rule either fires late on fast tails (measured maxcut n=1e5:
      q ~ 0.25, converged at restart 3 but raw step settles at 5-6,
      ~2x the certificate cost) or declares a slowly-creeping
      clustered spectrum (q ~ 0.6+) settled while it is still 2-3x
      off (measured on the theta profile).  Needs two steps, so it
      can't fire before restart 3.

    ``matvec_hi``: optional higher-precision operator (the SAME
    normalized slack at the solve's ambient dtype).  When given, the
    restart loop runs entirely at v0's (lower) precision — eigenVECTORS
    only need f32 accuracy — and the returned eigenvalue is the final
    Ritz vector's Rayleigh quotient at matvec_hi's precision, which
    SQUARES the low-precision angle error (~1e-4 -> ~1e-8 relative;
    same refinement _exact_min_eig uses for the eigh rescue).  On an
    f64-escalated solve this removes every ~12x-emulated f64 sweep
    matvec from the certificate: one f64 matvec total per bucket.
    """
    B, n = v0.shape
    k = min(k, n)
    max_restarts = max(-(-maxit // k), 2)
    dt = v0.dtype
    floor = 1e-4 if dt == jnp.float64 else 3e-3
    # With a hi-precision refinement attached, the POSITIVITY exit
    # keeps the f64 cutoff (ADVICE r3): the f64 Rayleigh quotient
    # squares the f32 ANGLE error, so the loose f32 residual band is
    # fine for value accuracy — but "lam - resid >= -tol*floor" is a
    # value claim made BEFORE refinement, and at f32's floor it could
    # under-report dinf by up to ~3e-5 per block on f64-escalated
    # (high-accuracy) solves.
    pos_floor = 1e-4 if matvec_hi is not None else floor

    def cond(c):
        it, lam, v, resid, lam_prev, step_prev = c
        band = tol * jnp.maximum(jnp.abs(lam), jnp.asarray(floor, dt))
        # purely RELATIVE band; the value probe below handles the
        # small-|lam| regime instead of an absolute floor
        step = jnp.abs(lam - lam_prev)
        q = jnp.minimum(step / jnp.maximum(step_prev, 1e-30), 0.9)
        remaining = step * q / (1.0 - q)
        valid = step_prev < jnp.finfo(dt).max  # needs two real steps
        settled = valid & (remaining <= 0.5 * tol * jnp.abs(lam))
        done = ((resid <= band) | (lam - resid >= -tol * pos_floor)
                | settled)
        return jnp.logical_and(it < max_restarts, ~jnp.all(done))

    def body(c):
        it, lam, v, _, lam_prev, _ = c
        lam_n, v_next, resid = _min_ritz(matvec, v, k)
        step_prev = jnp.abs(lam - lam_prev)
        return (it + 1, lam_n, v_next, resid, lam, step_prev)

    big = jnp.full((B,), jnp.finfo(dt).max, dt)
    init = (jnp.zeros((), jnp.int32), jnp.zeros((B,), dt), v0, big,
            -big, big)
    it, lam, v, _, _, _ = jax.lax.while_loop(cond, body, init)
    if matvec_hi is not None:
        # Rayleigh-quotient refinement at the hi dtype.  The loop's
        # carry v is the last-computed Ritz vector (unit norm up to
        # rounding); a broken-down block can carry v ~ 0 — keep its
        # sweep value there (breakdown = exact invariant subspace).
        vh = v.astype(jnp.float64)
        den = jnp.sum(vh * vh, axis=-1)
        num = jnp.sum(vh * matvec_hi(vh), axis=-1)
        lam = jnp.where(den > 1e-8, num / jnp.maximum(den, 1e-30),
                        lam.astype(jnp.float64))
    # restart count rides along for observability (certificate cost
    # attribution, VERDICT r2 #5); callers unpack (lam, restarts[, v])
    if return_vec:
        nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        return lam, it, v / jnp.maximum(nrm, 1e-30)
    return lam, it
