"""Microbenchmarks for the pattern-op primitives on the current backend.

The sparse-mode hot path is built from four primitives (ops/pattern.py):
  g1: row gather        [K, r] <- [n, r] at idx [K]
  s1: sorted scatter-add [K, r] -> [n, r] (segment_sum, ids sorted)
  g2: scalar gather     [nnz] <- [K]
  s2: scalar scatter    [nnz] -> [m] (segment_sum)

This times several implementations of each to pick the kernel strategy:
  - plain XLA (take_along_axis / segment_sum)
  - flattened-index XLA variants
  - Pallas in-VMEM dynamic gather (if Mosaic supports it)
  - one-hot block-matmul segment sum (MXU, no scatter at all)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_gather.py
"""

import os as _os
import jax as _jax
_cache = _os.path.join(_os.path.expanduser("~"), ".cache", "lorads_tpu_xla")
_os.makedirs(_cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:>34}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:>34}: {dt * 1e6:9.1f} us")
    return dt


def main():
    n = int(os.environ.get("MB_N", "20000"))
    K = int(os.environ.get("MB_K", "100000"))
    r = int(os.environ.get("MB_R", "20"))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, n, K)), jnp.int32)
    idx_rand = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(K), jnp.float32)
    pos = jnp.asarray(np.sort(rng.integers(0, K, n)), jnp.int32)
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}")

    # --- row gather ---
    @jax.jit
    def g_take(idx):
        return jnp.take(X, idx, axis=0)

    @jax.jit
    def g_tala(idx):
        return jnp.take_along_axis(X, idx[:, None], axis=0)

    @jax.jit
    def g_flat(idx):
        flat = X.reshape(-1)
        cols = jnp.arange(r, dtype=jnp.int32)[None, :]
        return flat[idx[:, None] * r + cols]

    @jax.jit
    def g_onehot_bf16(idx):
        # exact gather: one-hot (0/1, exact in bf16) x (hi+lo bf16 split)
        oh = (idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :])
        oh = oh.astype(jnp.bfloat16)
        hi = X.astype(jnp.bfloat16)
        lo = (X - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        return acc + jnp.dot(oh, lo, preferred_element_type=jnp.float32)

    timeit("gather take (rand)", lambda: g_take(idx_rand))
    timeit("gather take (sorted)", lambda: g_take(idx_sorted))
    timeit("gather take_along (rand)", lambda: g_tala(idx_rand))
    timeit("gather flat-idx (rand)", lambda: g_flat(idx_rand))
    if n <= 4096:
        timeit("gather onehot bf16x2 (rand)", lambda: g_onehot_bf16(idx_rand))

    # --- scalar gather [K]->[nnz] ---
    @jax.jit
    def gs(p):
        return sc[p]

    timeit("scalar gather", lambda: gs(pos))

    # --- sorted scatter-add to [n, r] ---
    @jax.jit
    def s_seg(v, idx):
        return jax.ops.segment_sum(v, idx, num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def s_seg_unsorted(v, idx):
        return jax.ops.segment_sum(v, idx, num_segments=n)

    timeit("segsum [K,r] sorted", lambda: s_seg(vals, idx_sorted))
    timeit("segsum [K,r] unsorted", lambda: s_seg_unsorted(vals, idx_rand))

    # one-hot block matmul segment-sum: rows sorted; tile output rows by
    # RT, input slots by KT, mask by equality => MXU matmuls.
    RT, KT = 256, 2048
    nt = -(-n // RT)
    # host: per row-tile, the slot range touching it
    idx_np = np.asarray(idx_sorted)
    starts = np.searchsorted(idx_np, np.arange(nt) * RT)
    # pad slot windows to KT (assumes max slots per RT rows <= KT)
    widths = np.searchsorted(idx_np, np.minimum(np.arange(nt) * RT + RT, n)) - starts
    print(f"  one-hot seg: max window {widths.max()} (KT={KT})")
    if widths.max() <= KT:
        starts_d = jnp.asarray(np.minimum(starts, max(K - KT, 0)), jnp.int32)

        @jax.jit
        def s_onehot(v, idx):
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)

            def tile(i):
                s0 = starts_d[i]
                ids = jax.lax.dynamic_slice(idx, (s0,), (KT,))
                vh = jax.lax.dynamic_slice(vhi, (s0, 0), (KT, r))
                vl = jax.lax.dynamic_slice(vlo, (s0, 0), (KT, r))
                rows = i * RT + jnp.arange(RT, dtype=jnp.int32)
                oh = (rows[:, None] == ids[None, :]).astype(jnp.bfloat16)
                return (jnp.dot(oh, vh, preferred_element_type=jnp.float32)
                        + jnp.dot(oh, vl, preferred_element_type=jnp.float32))

            out = jax.vmap(tile)(jnp.arange(nt, dtype=jnp.int32))
            return out.reshape(nt * RT, r)[:n]

        d = timeit("segsum one-hot blkmm", lambda: s_onehot(vals, idx_sorted))
        if d is not None:
            a = s_seg(vals, idx_sorted)
            b = s_onehot(vals, idx_sorted)
            err = float(jnp.max(jnp.abs(a - b)))
            print(f"  one-hot segsum max err vs segment_sum: {err:.3e}")

    # --- scalar scatter [nnz]->[m] ---
    m = n
    con = jnp.asarray(np.sort(rng.integers(0, m, K)), jnp.int32)

    @jax.jit
    def s2(v):
        return jax.ops.segment_sum(v, con, num_segments=m,
                                   indices_are_sorted=True)

    timeit("scalar segsum [K]->[m]", lambda: s2(sc))

    # --- Pallas: in-VMEM row gather ---
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        T = 2048

        def pg_kernel(x_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def pallas_gather(idx):
            return pl.pallas_call(
                pg_kernel,
                grid=(K // T,),
                in_specs=[
                    pl.BlockSpec((n, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((T,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((K, r), jnp.float32),
            )(X, idx)

        d = timeit("pallas vmem gather (rand)", lambda: pallas_gather(idx_rand))
        if d is not None:
            a = g_take(idx_rand)
            b = pallas_gather(idx_rand)
            print(f"  pallas gather max err: "
                  f"{float(jnp.max(jnp.abs(a - b))):.3e}")
    except Exception as e:  # noqa: BLE001
        print("pallas gather setup failed:", type(e).__name__, str(e)[:200])

    # --- fused pair-eval shape: 4 gathers + 2 rowdots (XLA) ---
    @jax.jit
    def pair_eval(Rf, Df):
        Rr = jnp.take(Rf, idx_sorted, axis=0)
        Rc = jnp.take(Rf, idx_rand, axis=0)
        Dr = jnp.take(Df, idx_sorted, axis=0)
        Dc = jnp.take(Df, idx_rand, axis=0)
        uv_rd = 0.5 * (jnp.sum(Rr * Dc, -1) + jnp.sum(Rc * Dr, -1))
        uv_dd = jnp.sum(Dr * Dc, -1)
        return uv_rd, uv_dd

    D = X + 0.5
    timeit("XLA pair-eval (4 gathers+dots)", lambda: pair_eval(X, D))


if __name__ == "__main__":
    main()
