"""One-hot window scatter, sublane-axis slot layout.

Coverage fix over microbench_gather5: slots live on the SUBLANE axis
(vals [Kp, r], ids [Kp, 1]) and each grid step reads TWO WT-sized
windows at block indices wb, wb+1 (WT-unit aligned), which exactly
covers any span <= WT.  Sublane-dim dynamic block offsets are the
form the remote Mosaic compiler accepts (lane-dim multi-window
offsets on multi-sublane arrays crash it).

Variants probed:
  A. out (CT, r) = oh^T @ v       (TN-form dot, oh (W2,CT))
  B. out (r, CT) = v^T @ oh       (TN-form dot, both operands (W2,*))
  C. XLA segsum baseline

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather6.py
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


def trial(name, fn, check=None, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:>40}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>40}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def main():
    n, K, r = 20000, 100000, 24
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}", flush=True)

    idx_s_np = np.sort(np.asarray(rng.integers(0, n, K)))
    vals_np = rng.standard_normal((K, r)).astype(np.float32)

    CT = 256            # output tile of n (lane axis of output for B)
    WT = 2048           # slot window (sublane-axis block unit)
    Np = ((n + CT - 1) // CT) * CT
    nt = Np // CT
    W2 = 2 * WT

    # segsum oracle
    seg = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    ref = np.asarray(seg(vals_np, idx_s_np))   # [n, r]
    trial("XLA segsum [K,r]->[n,r]",
          lambda: seg(jnp.asarray(vals_np), jnp.asarray(idx_s_np)),
          check=jnp.asarray(ref))

    starts = np.searchsorted(idx_s_np, np.arange(nt) * CT)
    ends = np.searchsorted(idx_s_np, np.arange(nt) * CT + CT)
    span = (ends - starts).max()
    wb_np = (starts // WT).astype(np.int32)
    print(f"   max window span {span} (must be <= WT={WT})", flush=True)
    cover = (wb_np * WT <= starts) & (ends <= (wb_np + 2) * WT)
    print(f"   two-window coverage ok: {bool(cover.all())}", flush=True)

    Kp = ((K + WT - 1) // WT + 2) * WT
    wb_np = np.minimum(wb_np, Kp // WT - 2)
    vals_p = jnp.zeros((Kp, r), jnp.float32).at[:K].set(vals_np)
    ids_p = jnp.full((Kp, 1), np.int32(n + 7)).at[:K, 0].set(
        jnp.asarray(idx_s_np, jnp.int32))
    wb = jnp.asarray(wb_np, jnp.int32)

    # ---- variant A: out (CT, r) tiles of the [Np, r] result ----
    def kA(wb_ref, v0, v1, id0, id1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)        # (W2, 1)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)            # (W2, r)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.float32)                 # (W2, CT)
        o_ref[:] = jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (CT, r)

    gsA = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
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
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def sA(vals_p, ids_p):
        return pl.pallas_call(
            kA, grid_spec=gsA,
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial("A: sublane 2-window, out (CT,r)",
          lambda: sA(vals_p, ids_p)[:n], check=jnp.asarray(ref))

    # ---- variant B: out (r, CT) tiles of the transposed [r, Np] ----
    def kB(wb_ref, v0, v1, id0, id1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)            # (W2, r)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.float32)                 # (W2, CT)
        o_ref[:] = jax.lax.dot_general(
            v, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (r, CT)

    gsB = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=gsA.in_specs,
        out_specs=pl.BlockSpec((r, CT), lambda i, wb: (0, i),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def sB(vals_p, ids_p):
        return pl.pallas_call(
            kB, grid_spec=gsB,
            out_shape=jax.ShapeDtypeStruct((r, Np), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial("B: sublane 2-window, out (r,CT)",
          lambda: sB(vals_p, ids_p)[:, :n], check=jnp.asarray(ref.T))

    # ---- variant A-bf16x2: split-precision MXU ----
    def kA16(wb_ref, v0, v1, id0, id1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.bfloat16)
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        o_ref[:] = (jax.lax.dot_general(oh, vh, dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(oh, vl, dn,
                                          preferred_element_type=jnp.float32))

    @jax.jit
    def sA16(vals_p, ids_p):
        return pl.pallas_call(
            kA16, grid_spec=gsA,
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial("A16: bf16x2 MXU, out (CT,r)",
          lambda: sA16(vals_p, ids_p)[:n], check=jnp.asarray(ref))


if __name__ == "__main__":
    main()
