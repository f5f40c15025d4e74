"""Measure tpu.dynamic_gather along the LANE dim with transposed layout.

Layout: factors stored [R, n] (R = rank padded to sublanes, n in lanes,
fully packed).  Gathering pattern columns = dynamic_gather along dim 1,
whose Mosaic constraint is indices.shape == table.shape == out.shape.
We tile K pattern slots into chunks of n columns.

Also measures a one-hot MXU window-scatter (segment-sum to columns,
sorted ids) in the same layout.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_pallas_gather3.py
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


def trial(name, fn, check=None, reps=20, rtol_note=True):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:>40}: FAILED {type(e).__name__}: {msg}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>40}: {dt * 1e6:9.1f} us{err}")
    return dt


def main():
    n, K, r = 20000, 100000, 20
    R = 24  # sublane-padded rank (multiple of 8)
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.standard_normal((R, n)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    refT = jnp.take(Xt, idx, axis=1)
    print(f"backend={jax.default_backend()} n={n} K={K} R={R}")

    # --- lane-dim dynamic gather, output tiled in chunks of n cols ---
    KC = K // n  # chunks (assume divisible here)
    assert K % n == 0

    def kG(x_ref, i_ref, o_ref):
        ids2 = jnp.broadcast_to(i_ref[:], (R, n))
        o_ref[:] = jnp.take_along_axis(x_ref[:], ids2, axis=1)

    @jax.jit
    def gT(idx):
        return pl.pallas_call(
            kG, grid=(KC,),
            in_specs=[pl.BlockSpec((R, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
        )(Xt, idx[None, :])

    trial("T-gather dyn [R,n] lanes", lambda: gT(idx), check=refT)

    # XLA take on transposed layout for comparison
    @jax.jit
    def gT_xla(idx):
        return jnp.take(Xt, idx, axis=1)

    trial("T-gather XLA take axis1", lambda: gT_xla(idx), check=refT)

    # --- fused: gather rows+cols, multiply, reduce over R (uvt core) ---
    idx_r = jnp.asarray(np.sort(rng.integers(0, n, K)), jnp.int32)
    Dt = Xt * 0.5 + 1.0

    def kUV(x_ref, d_ref, ir_ref, ic_ref, o_ref):
        ids_r = jnp.broadcast_to(ir_ref[:], (R, n))
        ids_c = jnp.broadcast_to(ic_ref[:], (R, n))
        xr = jnp.take_along_axis(x_ref[:], ids_r, axis=1)
        dc = jnp.take_along_axis(d_ref[:], ids_c, axis=1)
        xc = jnp.take_along_axis(x_ref[:], ids_c, axis=1)
        dr = jnp.take_along_axis(d_ref[:], ids_r, axis=1)
        o_ref[:] = (jnp.sum(xr * dc + xc * dr, axis=0,
                            keepdims=True) * 0.5)

    @jax.jit
    def uvT(ir, ic):
        return pl.pallas_call(
            kUV, grid=(KC,),
            in_specs=[pl.BlockSpec((R, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
        )(Xt, Dt, ir[None, :], ic[None, :])

    ref_uv = 0.5 * (jnp.sum(jnp.take(Xt, idx_r, 1) * jnp.take(Dt, idx, 1), 0)
                    + jnp.sum(jnp.take(Xt, idx, 1) * jnp.take(Dt, idx_r, 1),
                              0))
    trial("fused uvt 4-gather+dot", lambda: uvT(idx_r, idx)[0],
          check=ref_uv)

    # --- one-hot MXU window scatter: segsum [K] cols -> [n] cols ---
    # sorted col ids; output tiled by CT columns; per tile consume a
    # window of WT slots starting at a prefetched offset.
    CT, WT = 512, 4096
    ids_np = np.asarray(idx_r)
    nt = n // CT
    starts = np.searchsorted(ids_np, np.arange(nt) * CT).astype(np.int32)
    widths = np.searchsorted(ids_np, np.arange(nt) * CT + CT) - starts
    print(f"   scatter windows: max {widths.max()} (WT={WT})")
    starts = np.minimum(starts, max(K - WT, 0))
    vals = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)

    def kS(st_ref, v_hbm, id_hbm, o_ref, v_vm, id_vm, sem1, sem2):
        i = pl.program_id(0)
        s0 = st_ref[i]
        c1 = pltpu.make_async_copy(v_hbm.at[:, pl.ds(s0, WT)], v_vm, sem1)
        c2 = pltpu.make_async_copy(id_hbm.at[:, pl.ds(s0, WT)], id_vm, sem2)
        c1.start(); c2.start(); c1.wait(); c2.wait()
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (WT, CT), 1)
        oh = (id_vm[:].reshape(WT, 1) == cols).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            v_vm[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((R, CT), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, WT), jnp.float32),
                        pltpu.VMEM((1, WT), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def sT(vals, ids):
        return pl.pallas_call(
            kS, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, n), jnp.float32),
        )(jnp.asarray(starts), vals, ids[None, :])

    ref_s = jax.ops.segment_sum(np.asarray(vals).T, ids_np,
                                num_segments=n, indices_are_sorted=True).T
    trial("one-hot MXU window scatter", lambda: sT(vals, idx_r),
          check=jnp.asarray(ref_s))


if __name__ == "__main__":
    main()
