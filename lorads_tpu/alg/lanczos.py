"""Batched Lanczos smallest-eigenvalue estimation.

Replaces the reference's only non-BLAS native dependency: ARPACK
dsaupd_/dseupd_ ("SA", ncv=40, tol=1e-2, maxit=600) used for the dual
infeasibility certificate lambda_min(C - A^*(lambda))
(/root/reference/src_semi/data/lorads_sdp_conic.c:1286-1349).

Full-reorthogonalization Lanczos with Ritz-vector restarts, batched
over the bucket axis: the operator maps [B, n] -> [B, n].  The target
tolerance matches ARPACK's loose 1e-2; restarts make it robust on
clustered spectra.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _bnorm(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


@partial(jax.jit, static_argnames=("matvec", "k", "restarts"))
def lanczos_min_eig(matvec: Callable, v0: jnp.ndarray, k: int = 48,
                    restarts: int = 3):
    """Smallest eigenvalue of each block's symmetric operator.

    v0: [B, n] start vectors (random).  Returns eigenvalues [B].
    """
    B, n = v0.shape
    k = min(k, n)
    dt = v0.dtype
    BIG = jnp.asarray(1e30, dt)

    def one_sweep(v_start):
        v = v_start / jnp.maximum(_bnorm(v_start), 1e-30)
        Vs = jnp.zeros((k, B, n), dt)
        alphas = jnp.full((k, B), BIG)
        betas = jnp.zeros((k, B), dt)
        alive = jnp.ones((B, 1), dt)

        def step(j, carry):
            v, v_prev, beta_prev, Vs, alphas, betas, alive = carry
            w = matvec(v)
            a = jnp.sum(w * v, axis=-1)
            w = w - a[:, None] * v - beta_prev * v_prev
            # full reorthogonalization against stored basis
            coef = jnp.einsum("kbn,bn->kb", Vs, w)
            w = w - jnp.einsum("kbn,kb->bn", Vs, coef)
            b = _bnorm(w)
            alive_next = alive * (b[:, 0:1] > 1e-12).astype(dt)
            v_next = jnp.where(b > 1e-30, w / jnp.maximum(b, 1e-30), 0.0)
            Vs = Vs.at[j].set(v * alive)
            alphas = alphas.at[j].set(
                jnp.where(alive[:, 0] > 0, a, BIG))
            betas = betas.at[j].set(
                jnp.where(alive_next[:, 0] > 0, b[:, 0], 0.0))
            return (v_next, v, b, Vs, alphas, betas, alive_next)

        carry = (v, jnp.zeros_like(v), jnp.zeros((B, 1), dt),
                 Vs, alphas, betas, alive)
        v, v_prev, _, Vs, alphas, betas, alive = jax.lax.fori_loop(
            0, k, step, carry)

        # tridiagonal T per block, off-diagonals beta[0..k-2]
        T = jnp.zeros((B, k, k), dt)
        ii = jnp.arange(k)
        T = T.at[:, ii, ii].set(alphas.T)
        if k > 1:
            jj = jnp.arange(k - 1)
            off = betas.T[:, :-1]
            T = T.at[:, jj, jj + 1].set(off)
            T = T.at[:, jj + 1, jj].set(off)
        evals, evecs = jnp.linalg.eigh(T)
        lam = evals[:, 0]                       # smallest per block
        y = evecs[:, :, 0]                      # [B, k]
        ritz = jnp.einsum("kbn,bk->bn", Vs, y)
        return lam, ritz

    lam, ritz = one_sweep(v0)
    for _ in range(restarts - 1):
        lam, ritz = one_sweep(ritz)
    return lam
