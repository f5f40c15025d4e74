"""Probe Mosaic TPU support for in-kernel dynamic gathers.

Tries several formulations of "gather T rows from a VMEM-resident
[n, r] table by an int32 index vector" and times whatever compiles.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_pallas_gather.py
"""

import os as _os
import jax as _jax
_cache = _os.path.join(_os.path.expanduser("~"), ".cache", "lorads_tpu_xla")
_os.makedirs(_cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, reps=20, check=None):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:>30}: FAILED {type(e).__name__}: {msg}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>30}: {dt * 1e6:9.1f} us{err}")
    return dt


def main():
    n, K, r = 20000, 100000, 20
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    ref = jnp.take(X, idx, axis=0)
    T = 2048
    print(f"backend={jax.default_backend()} n={n} K={K} r={r} T={T}")

    # A: jnp.take(table, idx_tile) with idx as VMEM [T] block
    def kA(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    @jax.jit
    def gA(idx):
        return pl.pallas_call(
            kA, grid=(K // T,),
            in_specs=[pl.BlockSpec((n, r), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )(X, idx)

    timeit("A jnp.take axis0", lambda: gA(idx), check=ref)

    # B: take_along_axis with [T, 1] indices broadcast over r
    def kB(x_ref, i_ref, o_ref):
        ids = i_ref[:]  # [T, 1]
        o_ref[:] = jnp.take_along_axis(
            x_ref[:], jnp.broadcast_to(ids, (T, r)), axis=0)

    @jax.jit
    def gB(idx):
        return pl.pallas_call(
            kB, grid=(K // T,),
            in_specs=[pl.BlockSpec((n, r), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )(X, idx[:, None])

    timeit("B take_along_axis bc", lambda: gB(idx), check=ref)

    # C: x_ref[ids] fancy indexing
    def kC(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[i_ref[:], :]

    @jax.jit
    def gC(idx):
        return pl.pallas_call(
            kC, grid=(K // T,),
            in_specs=[pl.BlockSpec((n, r), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )(X, idx)

    timeit("C fancy x_ref[ids]", lambda: gC(idx), check=ref)

    # D: fori_loop of per-row dynamic slices (expected slow but correct)
    def kD(x_ref, i_ref, o_ref):
        def body(t, _):
            o_ref[pl.ds(t, 1), :] = x_ref[pl.ds(i_ref[t], 1), :]
            return 0
        jax.lax.fori_loop(0, T, body, 0)

    @jax.jit
    def gD(idx):
        return pl.pallas_call(
            kD, grid=(K // T,),
            in_specs=[pl.BlockSpec((n, r), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )(X, idx)

    timeit("D fori dyn-slice rows", lambda: gD(idx), check=ref, reps=3)

    # E: scalar gather of a [K]-vector by [nnz] ids (flat table in VMEM,
    #    2D layout [KR8, 128]); needs take on flattened
    vec = jnp.asarray(rng.standard_normal(K), jnp.float32)
    pos = jnp.asarray(rng.integers(0, K, n), jnp.int32)
    refE = vec[pos]
    TE = 2048

    def kE(v_ref, p_ref, o_ref):
        o_ref[:] = jnp.take(v_ref[:], p_ref[:], axis=0)

    @jax.jit
    def gE(pos):
        return pl.pallas_call(
            kE, grid=(n // TE if n % TE == 0 else n // TE + 1,),
            in_specs=[pl.BlockSpec((K,), lambda i: (0,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        )(vec, pos)

    # pad n to TE multiple outside for simplicity
    if n % TE == 0:
        timeit("E scalar take [K]->[n]", lambda: gE(pos), check=refE)
    else:
        npad = (n // TE + 1) * TE
        pos_p = jnp.concatenate([pos, jnp.zeros(npad - n, jnp.int32)])

        @jax.jit
        def gE2(pos_p):
            out = pl.pallas_call(
                kE, grid=(npad // TE,),
                in_specs=[pl.BlockSpec((K,), lambda i: (0,),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((TE,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TE,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
            )(vec, pos_p)
            return out[:n]

        timeit("E scalar take [K]->[n]", lambda: gE2(pos_p), check=refE)


if __name__ == "__main__":
    main()
