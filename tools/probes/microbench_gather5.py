"""Cost-model checks for the revised kernel plan.

1. XLA row-gather cost vs width (is it per-row or per-byte?)
2. scalar gather as [n,1] row-gather vs 1D take
3. Pallas one-hot window scatter using scalar-prefetch index_map
   (no manual DMA) -- does it compile, how fast
4. XLA segment_sum [K,r]->[n,r] baseline for (3)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather5.py
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
        msg = str(e).replace("\n", " ")[:160]
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
    n, K = 20000, 100000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    print(f"backend={jax.default_backend()} n={n} K={K}", flush=True)

    # 1. row-gather width scaling
    for r in (8, 20, 40, 64, 128):
        X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
        g = jax.jit(lambda i, X=X: jnp.take(X, i, axis=0))
        trial(f"row-gather width r={r}", lambda: g(idx))

    # 2. scalar gather as a [n, 1] row gather
    vec = jnp.asarray(rng.standard_normal(n), jnp.float32)
    pos = jnp.asarray(rng.integers(0, n, K), jnp.int32)

    g1d = jax.jit(lambda p: vec[p])
    g2d = jax.jit(lambda p: jnp.take(vec[:, None], p, axis=0)[:, 0])
    ref = vec[pos]
    trial("scalar gather 1D take", lambda: g1d(pos), check=ref)
    trial("scalar gather [n,1] rows", lambda: g2d(pos), check=ref)

    # 3/4. one-hot window scatter via scalar-prefetch index_map
    r = 24
    idx_s_np = np.sort(np.asarray(rng.integers(0, n, K)))
    Np = 20096
    CT = 256          # output col-tile (of n)
    WT = 2048         # slot window (multiple of lane 128? block units!)
    nt = Np // CT
    vals = jnp.asarray(rng.standard_normal((r, K)), jnp.float32)
    idx_s = jnp.asarray(idx_s_np, jnp.int32)

    # ref via XLA segment-sum (transposed form)
    seg = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    refT = seg(np.asarray(vals).T, idx_s_np).T
    trial("XLA segsum [K,r]->[n,r] (r=24)",
          lambda: seg(vals.T, idx_s).T, check=refT)

    # window starts in units of WT blocks... index_map returns BLOCK
    # indices: block w of the slots axis covers [w*WT, (w+1)*WT).
    starts = np.searchsorted(idx_s_np, np.arange(nt) * CT)
    ends = np.searchsorted(idx_s_np, np.arange(nt) * CT + CT)
    wblock = (starts // WT).astype(np.int32)
    span_ok = (ends - 1 < (wblock + 2) * WT) | (ends == starts)
    print(f"   windows: max span {(ends - starts).max()}, "
          f"2xWT covers all: {bool(span_ok.all())}", flush=True)
    # pad K to multiple of WT plus one extra window
    Kp = ((K + WT - 1) // WT + 1) * WT
    vals_p = jnp.zeros((r, Kp), jnp.float32).at[:, :K].set(vals)
    ids_p = jnp.full((1, Kp), n + 7, jnp.int32).at[0, :K].set(idx_s)
    wblock = jnp.asarray(np.minimum(wblock, Kp // WT - 2), jnp.int32)

    W2 = 2 * WT

    def kS(wb_ref, v_ref, id_ref, o_ref):
        i = pl.program_id(0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (id_ref[:].reshape(W2, 1) == cols).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            v_ref[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((r, W2), lambda i, wb: (0, wb[i] // 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W2), lambda i, wb: (0, wb[i] // 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, CT), lambda i, wb: (0, i),
                               memory_space=pltpu.VMEM),
    )
    # NOTE: index_map block units are W2-sized on the slots axis; wb[i]
    # is in WT units, so block index = wb[i] // 2 covers
    # [2*(wb//2)*WT, ...+2WT) -- need start block*W2 <= starts[i] and
    # coverage of ends[i].  Verify coverage on host:
    blk = (np.asarray(wblock) // 2) * W2
    cover = (blk <= starts) & (ends <= blk + W2)
    print(f"   W2 block coverage ok: {bool(cover.all())}", flush=True)

    @jax.jit
    def sP(vals_p, ids_p):
        return pl.pallas_call(
            kS, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r, Np), jnp.float32),
        )(wblock, vals_p, ids_p)

    if bool(cover.all()):
        trial("pallas one-hot window scatter",
              lambda: sP(vals_p, ids_p)[:, :n], check=jnp.asarray(refT))

    # bf16 split variant
    def kS16(wb_ref, v_ref, id_ref, o_ref):
        i = pl.program_id(0)
        cols = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
        oh = (id_ref[:].reshape(W2, 1) == cols).astype(jnp.bfloat16)
        v = v_ref[:]
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        o_ref[:] = (jax.lax.dot_general(vh, oh, dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(vl, oh, dn,
                                          preferred_element_type=jnp.float32))

    @jax.jit
    def sP16(vals_p, ids_p):
        return pl.pallas_call(
            kS16, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r, Np), jnp.float32),
        )(wblock, vals_p, ids_p)

    if bool(cover.all()):
        trial("pallas one-hot bf16x2 scatter",
              lambda: sP16(vals_p, ids_p)[:, :n], check=jnp.asarray(refT))


if __name__ == "__main__":
    main()
