"""Round 2: transposed-layout Pallas primitives with proper alignment.

- table [R, Np] with Np = round_up(n, 128); K padded to chunks of Np
- one-hot MXU window scatter with 128-aligned DMA windows

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_pallas_gather4.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ru(x, m):
    return (x + m - 1) // m * m


def trial(name, fn, check=None, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:>36}: FAILED {type(e).__name__}: {msg}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>36}: {dt * 1e6:9.1f} us{err}")
    return dt


def main():
    n, K, r = 20000, 100000, 20
    R = 24
    Np = ru(n, 128)            # 20096
    Kp = ru(K, Np)             # chunks of Np
    KC = Kp // Np
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(
        np.pad(rng.standard_normal((R, n)), ((0, 0), (0, Np - n))),
        jnp.float32)
    idx_np = rng.integers(0, n, K)
    idx = jnp.asarray(np.pad(idx_np, (0, Kp - K)), jnp.int32)
    refT = jnp.take(Xt, idx, axis=1)
    print(f"backend={jax.default_backend()} n={n}->{Np} K={K}->{Kp} R={R}")

    def kG(x_ref, i_ref, o_ref):
        ids2 = jnp.broadcast_to(i_ref[:], (R, Np))
        o_ref[:] = jnp.take_along_axis(x_ref[:], ids2, axis=1)

    @jax.jit
    def gT(idx):
        return pl.pallas_call(
            kG, grid=(KC,),
            in_specs=[pl.BlockSpec((R, Np), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Np), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, Np), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, Kp), jnp.float32),
        )(Xt, idx[None, :])

    trial("T-gather dyn lanes", lambda: gT(idx), check=refT)

    # fused uvt: 4 gathers + dot
    idx_r_np = np.sort(rng.integers(0, n, K))
    idx_r = jnp.asarray(np.pad(idx_r_np, (0, Kp - K)), jnp.int32)
    Dt = Xt * 0.5 + 1.0

    def kUV(x_ref, d_ref, ir_ref, ic_ref, o_ref):
        ids_r = jnp.broadcast_to(ir_ref[:], (R, Np))
        ids_c = jnp.broadcast_to(ic_ref[:], (R, Np))
        xr = jnp.take_along_axis(x_ref[:], ids_r, axis=1)
        dc = jnp.take_along_axis(d_ref[:], ids_c, axis=1)
        xc = jnp.take_along_axis(x_ref[:], ids_c, axis=1)
        dr = jnp.take_along_axis(d_ref[:], ids_r, axis=1)
        o_ref[:] = jnp.sum(xr * dc + xc * dr, axis=0, keepdims=True) * 0.5

    @jax.jit
    def uvT(ir, ic):
        return pl.pallas_call(
            kUV, grid=(KC,),
            in_specs=[pl.BlockSpec((R, Np), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, Np), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Np), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Np), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Np), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        )(Xt, Dt, ir[None, :], ic[None, :])

    ref_uv = 0.5 * (jnp.sum(jnp.take(Xt, idx_r, 1) * jnp.take(Dt, idx, 1), 0)
                    + jnp.sum(jnp.take(Xt, idx, 1) * jnp.take(Dt, idx_r, 1),
                              0))
    trial("fused uvt 4-gather+dot", lambda: uvT(idx_r, idx)[0],
          check=ref_uv)

    # one-hot MXU window scatter, aligned windows
    CT, WT = 256, 2048
    nt = Np // CT
    starts = np.searchsorted(idx_r_np, np.arange(nt) * CT).astype(np.int64)
    ends = np.searchsorted(idx_r_np, np.arange(nt) * CT + CT)
    starts_al = (starts // 128) * 128
    wmax = (ends - starts_al).max()
    print(f"   scatter window max {wmax} (WT={WT})")
    starts_al = np.minimum(starts_al, max(Kp - WT, 0)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((R, Kp)), jnp.float32)
    ref_s = jax.ops.segment_sum(
        np.asarray(vals).T[:K], idx_r_np, num_segments=Np,
        indices_are_sorted=True).T

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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((R, CT), lambda i, *_: (0, i)),
        scratch_shapes=[pltpu.VMEM((R, WT), jnp.float32),
                        pltpu.VMEM((1, WT), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )

    # mark padded tail ids as out-of-range so they never match a col
    idx_r_scatter = jnp.asarray(
        np.pad(idx_r_np, (0, Kp - K), constant_values=Np + 7), jnp.int32)

    @jax.jit
    def sT(vals, ids):
        return pl.pallas_call(
            kS, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, Np), jnp.float32),
        )(jnp.asarray(starts_al), vals, ids[None, :])

    trial("one-hot MXU window scatter", lambda: sT(vals, idx_r_scatter),
          check=jnp.asarray(ref_s))

    # bf16 2-split variant (cheaper MXU, ~1e-5 rel err)
    def kS16(st_ref, v_hbm, id_hbm, o_ref, v_vm, id_vm, sem1, sem2):
        i = pl.program_id(0)
        s0 = st_ref[i]
        c1 = pltpu.make_async_copy(v_hbm.at[:, pl.ds(s0, WT)], v_vm, sem1)
        c2 = pltpu.make_async_copy(id_hbm.at[:, pl.ds(s0, WT)], id_vm, sem2)
        c1.start(); c2.start(); c1.wait(); c2.wait()
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (WT, CT), 1)
        oh = (id_vm[:].reshape(WT, 1) == cols).astype(jnp.bfloat16)
        v = v_vm[:]
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        o_ref[:] = (
            jax.lax.dot_general(vh, oh, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(vl, oh, dn,
                                  preferred_element_type=jnp.float32))

    @jax.jit
    def sT16(vals, ids):
        return pl.pallas_call(
            kS16, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, Np), jnp.float32),
        )(jnp.asarray(starts_al), vals, ids[None, :])

    trial("one-hot bf16x2 window scatter", lambda: sT16(vals, idx_r_scatter),
          check=jnp.asarray(ref_s))


if __name__ == "__main__":
    main()
