"""Probe the exact 2D dynamic-gather form Mosaic supports, over table
sizes; then time the winning form.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_pallas_gather2.py
"""

import os as _os
import jax as _jax
_cache = _os.path.join(_os.path.expanduser("~"), ".cache", "lorads_tpu_xla")
_os.makedirs(_cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trial(name, fn, check=None, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"{name:>38}: FAILED {type(e).__name__}: {msg}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>38}: {dt * 1e6:9.1f} us{err}")
    return dt


def row_gather_variant(n, K, r, T, mode):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    ref = jnp.take(X, idx, axis=0)

    def kernel(x_ref, i_ref, o_ref):
        ids = i_ref[:]                      # [T, 1] int32
        ids2 = jnp.broadcast_to(ids, (T, r))
        if mode == "tala":
            o_ref[:] = jnp.take_along_axis(x_ref[:], ids2, axis=0)
        elif mode == "dyn_gather":
            # lax.gather equivalent via take_along_axis on loaded value
            x = x_ref[:]
            o_ref[:] = jnp.take_along_axis(x, ids2, axis=0)

    @jax.jit
    def g(idx):
        return pl.pallas_call(
            kernel, grid=(K // T,),
            in_specs=[pl.BlockSpec((n, r), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
        )(X, idx[:, None])

    return trial(f"rowgather n={n} r={r} T={T} {mode}",
                 lambda: g(idx), check=ref)


def main():
    print(f"backend={jax.default_backend()}")
    # sweep table height n: maybe gather limited to small sublane count
    for n in (8, 128, 1024, 2048, 8192, 20000):
        row_gather_variant(n, 16384, 20, 512, "tala")
    # bigger r (lane width) sanity
    row_gather_variant(2048, 16384, 128, 512, "tala")
    # full-size problem if supported
    row_gather_variant(20000, 100000, 20, 2048, "tala")
    row_gather_variant(20000, 100000, 20, 512, "tala")
    # scalar gather as 2D: table [K8, 128] gather along axis 0 per lane?
    # out[t, l] = v2[idx2[t, l], l] -- per-lane table differs, so this
    # only works if we store the vector REPLICATED per lane or accept
    # lane-local tables.  Instead: scalar gather via row-gather of a
    # [K, 1] table.
    n, K = 100000, 20000
    rng = np.random.default_rng(1)
    vec = jnp.asarray(rng.standard_normal(n), jnp.float32)
    pos = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    refE = vec[pos]
    T = 2048

    def kE(v_ref, p_ref, o_ref):
        ids = jnp.broadcast_to(p_ref[:], (T, 1))
        o_ref[:] = jnp.take_along_axis(v_ref[:], ids, axis=0)

    @jax.jit
    def gE(pos):
        return pl.pallas_call(
            kE, grid=(K // T + (1 if K % T else 0),),
            in_specs=[pl.BlockSpec((n, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                ((K // T + (1 if K % T else 0)) * T, 1), jnp.float32),
        )(vec[:, None], jnp.pad(pos, (0, (T - K % T) % T))[:, None])

    trial(f"scalar gather [n={n}]->[K={K}] as [.,1]",
          lambda: gE(pos)[:K, 0], check=refE)


if __name__ == "__main__":
    main()
