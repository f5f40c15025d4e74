"""Find which difference between microbench_gather6's WORKING pallas
kernel and ops/onehot.py's CRASHING one breaks the Mosaic remote
compiler; also retime the working variant with proper host-transfer
sync (block_until_ready lies on axon).

Variants (cumulative morph from gather6-A toward onehot.sorted_scatter):
  A0 exact gather6-A (closures, vals-first operand order)
  A1 + functools.partial(kernel, CT=..., WT=...) kwargs
  A2 + ids-first operand order
  A3 + shared lambda object reused across BlockSpecs
  A4 + in-kernel bf16x3 via helper with Python loop
  A5 the real onehot.sorted_scatter / plan path
  G5 the real onehot.sorted_gather / plan path

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_onehot_bisect.py
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

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import onehot


def trial(name, fn, *args, check=None, reps=20):
    try:
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0][:1])
    except Exception as e:  # noqa: BLE001
        print(f"{name:>34}: FAILED {type(e).__name__}: "
              f"{str(e)[:110]}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>34}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def main():
    n, K, r = 20000, 80000, 20
    CT, WT = 256, 2048
    W2 = 2 * WT
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}", flush=True)
    ids_np = np.sort(rng.integers(0, n, K)).astype(np.int32)
    vals_np = rng.standard_normal((K, r)).astype(np.float32)

    seg = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    vals_d = jnp.asarray(vals_np)
    ids_d = jnp.asarray(ids_np)
    ref = seg(vals_d, ids_d)
    trial("XLA segsum (sync-corrected)", seg, vals_d, ids_d)
    g = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
    X_d = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    trial("XLA gather (sync-corrected)", g, X_d, ids_d)

    # shared host prep (gather6 style)
    Np = (n + CT - 1) // CT * CT
    nt = Np // CT
    starts = np.searchsorted(ids_np, np.arange(nt) * CT)
    Kp = ((K + WT - 1) // WT + 2) * WT
    wb = jnp.asarray(np.minimum(starts // WT, Kp // WT - 2), np.int32)
    vals_p = jnp.zeros((Kp, r), jnp.float32).at[:K].set(vals_np)
    ids_p = jnp.full((Kp, 1), np.int32(Np + 7)).at[:K, 0].set(
        jnp.asarray(ids_np))

    def specs(shared_lambda):
        if shared_lambda:
            w0 = lambda i, wb: (wb[i], 0)
            w1 = lambda i, wb: (wb[i] + 1, 0)
            return [pl.BlockSpec((WT, r), w0, memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, r), w1, memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, 1), w0, memory_space=pltpu.VMEM),
                    pl.BlockSpec((WT, 1), w1, memory_space=pltpu.VMEM)]
        return [pl.BlockSpec((WT, r), lambda i, wb: (wb[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, r), lambda i, wb: (wb[i] + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, 1), lambda i, wb: (wb[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, 1), lambda i, wb: (wb[i] + 1, 0),
                             memory_space=pltpu.VMEM)]

    out_spec = pl.BlockSpec((CT, r), lambda i, wb: (i, 0),
                            memory_space=pltpu.VMEM)

    # ---- A0: exact gather6-A ----
    def kA0(wb_ref, v0, v1, id0, id1, o_ref):
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
    def sA0(vals_p, ids_p):
        return pl.pallas_call(
            kA0,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=specs(False), out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial("A0 gather6-exact", lambda: sA0(vals_p, ids_p)[:n], check=ref)

    # ---- A1: functools.partial kwargs ----
    def kA1(wb_ref, v0, v1, id0, id1, o_ref, *, CT_, WT_):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)
        cols = i * CT_ + jax.lax.broadcasted_iota(
            jnp.int32, (2 * WT_, CT_), 1)
        oh = (ids == cols).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def sA1(vals_p, ids_p):
        return pl.pallas_call(
            functools.partial(kA1, CT_=CT, WT_=WT),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=specs(False), out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, vals_p, vals_p, ids_p, ids_p)

    trial("A1 +partial-kwargs", lambda: sA1(vals_p, ids_p)[:n], check=ref)

    # ---- A2: ids-first operand order ----
    def kA2(wb_ref, id0, id1, v0, v1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    sp = specs(False)
    @jax.jit
    def sA2(vals_p, ids_p):
        return pl.pallas_call(
            kA2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=[sp[2], sp[3], sp[0], sp[1]],
                out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, ids_p, ids_p, vals_p, vals_p)

    trial("A2 +ids-first", lambda: sA2(vals_p, ids_p)[:n], check=ref)

    # ---- A3: shared lambda objects ----
    @jax.jit
    def sA3(vals_p, ids_p):
        s = specs(True)
        return pl.pallas_call(
            kA2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=[s[2], s[3], s[0], s[1]],
                out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, ids_p, ids_p, vals_p, vals_p)

    trial("A3 +shared-lambda", lambda: sA3(vals_p, ids_p)[:n], check=ref)

    # ---- A4: bf16x3 helper loop ----
    def kA4(wb_ref, id0, id1, v0, v1, o_ref):
        i = pl.program_id(0)
        ids = jnp.concatenate([id0[:], id1[:]], axis=0)
        v = jnp.concatenate([v0[:], v1[:]], axis=0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (ids == cols).astype(jnp.bfloat16)
        hi = v.astype(jnp.bfloat16)
        rem = v - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = None
        for p in (hi, mid, lo):
            part = jax.lax.dot_general(
                oh, p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    @jax.jit
    def sA4(vals_p, ids_p):
        return pl.pallas_call(
            kA4,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nt,),
                in_specs=[sp[2], sp[3], sp[0], sp[1]],
                out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct((Np, r), jnp.float32),
        )(wb, ids_p, ids_p, vals_p, vals_p)

    trial("A4 +bf16x3-loop", lambda: sA4(vals_p, ids_p)[:n], check=ref)

    # ---- A5/G5: the real module ----
    plan = onehot.plan_sorted_scatter(ids_np, n, CT=CT, WT=WT)
    print(f"   plan ok={plan.ok} WT={plan.WT} K_pad={plan.K_pad} "
          f"n_pad={plan.n_pad}", flush=True)
    for mode in ("f32", "bf16x3", "bf16x2"):
        f = jax.jit(functools.partial(onehot.sorted_scatter, plan=plan,
                                      mode=mode))
        trial(f"A5 onehot.sorted_scatter {mode}", f, vals_d, check=ref)
    gplan = onehot.plan_sorted_gather(ids_np, n, KT=256)
    print(f"   gplan ok={gplan.ok} WT={gplan.WT}", flush=True)
    ref_g = g(X_d, ids_d)
    for mode in ("f32", "bf16x3"):
        f = jax.jit(functools.partial(onehot.sorted_gather, plan=gplan,
                                      mode=mode))
        trial(f"G5 onehot.sorted_gather {mode}", f, X_d, check=ref_g)


if __name__ == "__main__":
    main()
