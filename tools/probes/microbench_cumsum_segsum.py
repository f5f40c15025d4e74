"""Sorted segment-sum via cumsum + static boundary gathers vs scatter.

The hot scatters (w_mul lower/upper passes, constr_vals, build_w) all
run at SORTED, STATICALLY-KNOWN ids.  A sorted segment sum equals a
difference of prefix sums at static segment boundaries:

    csum = concat(0, cumsum(data))          # [K+1, r]
    out[j] = csum[end[j]] - csum[start[j]]  # boundaries known at build

No scatter at all: one cumsum (bandwidth-bound, vectorized over the r
columns) + two gathers of num_segments rows.  For f64 this bypasses the
~18x-slow TPU f64 scatter; for f32 it may also beat the 8 ns/row
scatter floor.

Timing: in-loop differencing (fori_loop at two budgets), host transfer
to sync — block_until_ready is unreliable on the axon backend.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_cumsum_segsum.py
"""

import os as _os

import jax as _jax

_cache = _os.path.join(_os.path.expanduser("~"), ".cache", "lorads_tpu_xla")
_os.makedirs(_cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_enable_x64", True)

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, k1=64, k2=256):
    f = lambda k: jax.device_get(fn(k))
    f(8)
    f(8)
    t0 = time.time()
    f(k1)
    t1 = time.time()
    f(k2)
    t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
    print(f"{name:>44}: {per * 1e6:9.1f} us/op")
    return per


@partial(jax.jit, static_argnames=("k", "n"))
def scatter_loop(data, ids, n, k):
    def body(i, acc):
        d = data * (1.0 + acc * 1e-20)
        out = jax.ops.segment_sum(d, ids, num_segments=n,
                                  indices_are_sorted=True)
        return acc + out[0, 0] * 1e-20

    return jax.lax.fori_loop(0, k, body, jnp.zeros((), data.dtype))


@partial(jax.jit, static_argnames=("k",))
def cumsum_loop(data, starts, ends, k):
    def body(i, acc):
        d = data * (1.0 + acc * 1e-20)
        cs = jnp.cumsum(d, axis=0)
        cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
        out = cs[ends] - cs[starts]
        return acc + out[0, 0] * 1e-20

    return jax.lax.fori_loop(0, k, body, jnp.zeros((), data.dtype))


def main():
    rng = np.random.default_rng(0)
    for (K, r, n) in [(80000, 24, 20000), (24000, 1, 12000),
                      (4600, 1, 4600), (45000, 12, 300)]:
        ids_np = np.sort(rng.integers(0, n, K).astype(np.int32))
        starts_np = np.searchsorted(ids_np, np.arange(n)).astype(np.int32)
        ends_np = np.searchsorted(ids_np, np.arange(n),
                                  side="right").astype(np.int32)
        for dt in (np.float32, np.float64):
            data = jnp.asarray(rng.standard_normal((K, r)), dt)
            ids = jnp.asarray(ids_np)
            starts = jnp.asarray(starts_np)
            ends = jnp.asarray(ends_np)
            # correctness
            ref = jax.ops.segment_sum(np.asarray(data, np.float64),
                                      ids_np, num_segments=n)
            cs = jnp.concatenate([jnp.zeros((1, r), dt),
                                  jnp.cumsum(data, axis=0)], 0)
            got = cs[ends] - cs[starts]
            err = float(jnp.max(jnp.abs(got - jnp.asarray(ref, dt))))
            tag = f"K={K} r={r} n={n} {np.dtype(dt).name}"
            print(f"{tag}: maxerr={err:.2e}")
            bench(f"scatter  {tag}",
                  lambda k: scatter_loop(data, ids, n, k))
            bench(f"cumsum   {tag}",
                  lambda k: cumsum_loop(data, starts, ends, k))


if __name__ == "__main__":
    main()
