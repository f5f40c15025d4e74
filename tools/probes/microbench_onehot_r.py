"""Is the Mosaic crash driven by r (block lane dim) not being a
multiple of 8?  Run the gather6-A scatter kernel at r in {16, 20, 24,
32, 128} with everything else fixed, plus Kp variants.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_onehot_r.py
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


def trial(name, fn, *args, check=None, reps=20):
    try:
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0][:1])
    except Exception as e:  # noqa: BLE001
        print(f"{name:>36}: FAILED {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>36}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def scatter_variant(n, K, r, CT, WT, extra_blocks, rng):
    W2 = 2 * WT
    ids_np = np.sort(rng.integers(0, n, K)).astype(np.int32)
    vals_np = rng.standard_normal((K, r)).astype(np.float32)
    Np = (n + CT - 1) // CT * CT
    nt = Np // CT
    starts = np.searchsorted(ids_np, np.arange(nt) * CT)
    span = int((np.searchsorted(ids_np, np.arange(nt) * CT + CT)
                - starts).max())
    if span > WT:
        print(f"   r={r}: span {span} > WT, skip")
        return
    Kp = ((K + WT - 1) // WT + extra_blocks) * WT
    wb = jnp.asarray(np.minimum(starts // WT, Kp // WT - 2), np.int32)
    vals_p = jnp.zeros((Kp, r), jnp.float32).at[:K].set(vals_np)
    ids_p = jnp.full((Kp, 1), np.int32(Np + 7)).at[:K, 0].set(
        jnp.asarray(ids_np))
    ref = jax.ops.segment_sum(jnp.asarray(vals_np), jnp.asarray(ids_np),
                              num_segments=Np, indices_are_sorted=True)

    def k(wb_ref, v0, v1, id0, id1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def s(vals_p, ids_p):
        return pl.pallas_call(
            k,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=[
                    pl.BlockSpec((WT, r), lambda i, wb: (wb[i], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, r), lambda i, wb: (wb[i] + 1, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, 1), lambda i, wb: (wb[i], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, 1), lambda i, wb: (wb[i] + 1, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CT, r), lambda i, wb: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial(f"r={r} K={K} Kp={Kp} CT={CT} WT={WT}",
          lambda: s(vals_p, ids_p), check=ref)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n = 20000
    for r in (16, 20, 24, 32, 128):
        scatter_variant(n, 80000, r, 256, 2048, 2, rng)
    # Kp padding-count variants at r=24 / r=20
    scatter_variant(n, 100000, 24, 256, 2048, 1, rng)
    scatter_variant(n, 100000, 20, 256, 2048, 1, rng)


if __name__ == "__main__":
    main()
