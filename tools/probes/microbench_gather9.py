"""Unsorted row-gather from a VMEM-resident table via a Pallas scalar
loop — can it beat XLA's ~20 ns/row random-access gather?

The factor matrix [n, r] fits VMEM at our scales (n=20000, r=24 ->
1.9 MB padded).  A kernel that keeps it resident and walks the id
list with dynamic sublane loads pays VMEM random-access cost instead
of HBM latency.

Variants: grid tile over ids; ids via scalar prefetch (SMEM) vs VMEM
sublane reads; manual unroll.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather9.py
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


def trial(name, fn, check=None, reps=30):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:>44}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>44}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def main():
    n, K, r = 20000, 160000, 24
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, n, K).astype(np.int32)
    X_np = rng.standard_normal((n, r)).astype(np.float32)
    X = jnp.asarray(X_np)
    ids = jnp.asarray(ids_np)
    ref = jnp.asarray(X_np[ids_np])
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}", flush=True)

    g = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
    trial("XLA unsorted row gather", lambda: g(X, ids), check=ref)

    n_pad = (n + 7) // 8 * 8

    # --- variant A: scalar-prefetch ids, fori_loop of dynamic loads ---
    def kA(ids_ref, x_ref, o_ref, *, KT):
        i = pl.program_id(0)

        def body(j, _):
            idx = ids_ref[i * KT + j]
            o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(idx, 1), :]
            return 0

        jax.lax.fori_loop(0, KT, body, 0)

    for KT in (2048, 8192):
        nt = K // KT
        fA = pl.pallas_call(
            functools.partial(kA, KT=KT),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nt,),
                in_specs=[pl.BlockSpec((n_pad, r), lambda i, ids: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((KT, r), lambda i, ids: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )
        Xp = jnp.zeros((n_pad, r), jnp.float32).at[:n].set(X)
        fAj = jax.jit(lambda Xp, ids, fA=fA: fA(ids, Xp))
        trial(f"A scalar-loop gather KT={KT}", lambda: fAj(Xp, ids),
              check=ref)

    # --- variant B: unroll 8 inside the loop ---
    def kB(ids_ref, x_ref, o_ref, *, KT):
        i = pl.program_id(0)

        def body(j, _):
            for u in range(8):
                idx = ids_ref[i * KT + j * 8 + u]
                o_ref[pl.ds(j * 8 + u, 1), :] = x_ref[pl.ds(idx, 1), :]
            return 0

        jax.lax.fori_loop(0, KT // 8, body, 0)

    for KT in (8192,):
        nt = K // KT
        fB = pl.pallas_call(
            functools.partial(kB, KT=KT),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nt,),
                in_specs=[pl.BlockSpec((n_pad, r), lambda i, ids: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((KT, r), lambda i, ids: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )
        Xp = jnp.zeros((n_pad, r), jnp.float32).at[:n].set(X)
        fBj = jax.jit(lambda Xp, ids, fB=fB: fB(ids, Xp))
        trial(f"B unroll8 gather KT={KT}", lambda: fBj(Xp, ids),
              check=ref)

    # --- variant C: accumulate-free unsorted scatter (serial RMW) ---
    vals = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)
    seg = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=n))
    ref_sc = seg(vals, ids)
    trial("XLA unsorted segment_sum", lambda: seg(vals, ids),
          check=ref_sc)

    def kC(ids_ref, v_ref, o_ref, *, K):
        o_ref[:] = jnp.zeros_like(o_ref)

        def body(j, _):
            idx = ids_ref[j]
            o_ref[pl.ds(idx, 1), :] = (o_ref[pl.ds(idx, 1), :]
                                       + v_ref[pl.ds(j, 1), :])
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    fC = pl.pallas_call(
        functools.partial(kC, K=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((K, r), lambda i, ids: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_pad, r), lambda i, ids: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, r), jnp.float32),
    )
    fCj = jax.jit(lambda v, ids: fC(ids, v)[:n])
    trial("C scalar-loop scatter", lambda: fCj(vals, ids), check=ref_sc)


if __name__ == "__main__":
    main()
