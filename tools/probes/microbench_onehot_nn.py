"""NN-form one-hot window scatter: ids as a (1, Kp) single-sublane
array with LANE-dim windows (allowed for single-sublane operands),
one-hot built directly as (CT, W2) — no in-kernel transposes — and
bf16 plane variants.  Goal: beat the ~2 ms TN-form / XLA segsum.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_onehot_nn.py
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
        print(f"{name:>44}: FAILED {type(e).__name__}: "
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
    print(f"{name:>44}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def variant(n, K, r, CT, WT, mode, rng):
    W2 = 2 * WT
    ids_np = np.sort(rng.integers(0, n, K)).astype(np.int32)
    vals_np = rng.standard_normal((K, r)).astype(np.float32)
    Np = (n + CT - 1) // CT * CT
    nt = Np // CT
    starts = np.searchsorted(ids_np, np.arange(nt) * CT)
    span = int((np.searchsorted(ids_np, np.arange(nt) * CT + CT)
                - starts).max())
    if span > WT:
        print(f"   CT={CT}: span {span} > WT={WT}, skip", flush=True)
        return
    Kp = ((K + WT - 1) // WT + 2) * WT
    wb = jnp.asarray(np.minimum(starts // WT, Kp // WT - 2), np.int32)
    vals_p = jnp.zeros((Kp, r), jnp.float32).at[:K].set(vals_np)
    ids_row = jnp.full((1, Kp), np.int32(Np + 7)).at[0, :K].set(
        jnp.asarray(ids_np))
    ref = jax.ops.segment_sum(jnp.asarray(vals_np), jnp.asarray(ids_np),
                              num_segments=Np, indices_are_sorted=True)

    def k(wb_ref, id0, id1, v0, v1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=1)   # (1, W2) lanes
        segs = i * CT + jax.lax.broadcasted_iota(jnp.int32, (CT, W2), 0)
        ohb = ids == segs                                  # (CT, W2)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)        # (W2, r)
        dn = (((1,), (0,)), ((), ()))                      # NN form
        if mode == "f32":
            oh = ohb.astype(jnp.float32)
            acc = jax.lax.dot_general(
                oh, v, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            oh = ohb.astype(jnp.bfloat16)
            hi = v.astype(jnp.bfloat16)
            rem = v - hi.astype(jnp.float32)
            planes = ((hi, rem.astype(jnp.bfloat16))
                      if mode == "bf16x2" else
                      (hi, rem.astype(jnp.bfloat16),
                       (rem - rem.astype(jnp.bfloat16).astype(
                           jnp.float32)).astype(jnp.bfloat16)))
            acc = None
            for p in planes:
                part = jax.lax.dot_general(
                    oh, p, dn, preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        o_ref[:] = acc

    @jax.jit
    def s(vals_p, ids_row):
        return pl.pallas_call(
            k,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=[
                    pl.BlockSpec((1, WT), lambda i, wb: (0, wb[i]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, WT), lambda i, wb: (0, wb[i] + 1),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, r), lambda i, wb: (wb[i], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, r), lambda i, wb: (wb[i] + 1, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CT, r), lambda i, wb: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, ids_row, ids_row, vals_p, vals_p)

    trial(f"NN CT={CT} WT={WT} {mode}", lambda: s(vals_p, ids_row),
          check=ref)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n, K, r = 20000, 80000, 24
    for CT, WT in ((256, 2048), (512, 4096), (1024, 8192), (128, 1024)):
        for mode in ("bf16x2", "f32"):
            variant(n, K, r, CT, WT, mode, rng)


if __name__ == "__main__":
    main()
