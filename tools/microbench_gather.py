"""Gather/segment-sum throughput microbench on the ambient backend.

The split-mode pattern kernels' ceiling (matcomp2000 1.6x,
maxcut100000 16 s) is the per-entry factor-row gather + sorted
segment-sum.  This tool pins down WHERE the loss is so the round-5
kernel redesign starts from numbers, not guesses:

  a. raw row gather [K] from [n, r] at the production r (~24)
  b. the same at r=128 (full lane width) — isolates the sublane
     penalty
  c. the fused uvt-style op (two gathers + rowwise dot)
  d. sorted segment-sum of [K] values (scatter side)
  e. bounded (cumsum + boundary-gather) segment sum
  f. dense 512x2048x128 window matmuls covering the same pattern
     (lower-bound sanity for a blocked one-hot/Pallas design)

Per-dispatch tunnel latency is ~45 ms on this image, so every op is
timed INSIDE a jitted fori_loop by differencing two loop lengths
(ROUND1_NOTES timing rule; `block_until_ready` is unreliable here).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_gather.py
Env: GB_N=4000 GB_K=960000 GB_R=24
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bench_loop(name, make_op, n1=8, n2=24):
    """Time one op via in-jit loop differencing.  ``make_op(i)`` must
    CONSUME the loop counter so iterations cannot be CSE'd away."""

    @partial(jax.jit, static_argnames=("n",))
    def run(n):
        def body(i, acc):
            return acc + make_op(i)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    jax.device_get(run(n1))
    jax.device_get(run(n2))
    ts = []
    for n in (n1, n2):
        t0 = time.time()
        for _ in range(3):
            jax.device_get(run(n))
        ts.append((time.time() - t0) / 3)
    dt = (ts[1] - ts[0]) / (n2 - n1)
    print(f"{name:>42}: {dt * 1e3:9.3f} ms/op")
    return dt


def main():
    n = int(os.environ.get("GB_N", "4000"))
    K = int(os.environ.get("GB_K", "960000"))
    r = int(os.environ.get("GB_R", "24"))
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n, K)).astype(np.int32)
    cols = rng.integers(0, n, K).astype(np.int32)
    X24 = jnp.asarray(rng.standard_normal((1, n, r)), jnp.float32)
    X128 = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)
    ri = jnp.asarray(rows[None])
    ci = jnp.asarray(cols[None])
    vals = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}")
    gb24 = K * r * 4 / 1e9
    gb128 = K * 128 * 4 / 1e9

    dt = bench_loop(
        f"gather [K] rows of [n,{r}]",
        lambda i: jnp.sum(jnp.take_along_axis(
            X24 + i * 1e-30, ri[:, :, None], axis=1)))
    print(f"{'':>44}-> {gb24 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        "gather [K] rows of [n,128]",
        lambda i: jnp.sum(jnp.take_along_axis(
            X128 + i * 1e-30, ri[:, :, None], axis=1)))
    print(f"{'':>44}-> {gb128 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        f"uvt-like 2x gather + dot (r={r})",
        lambda i: jnp.sum(
            jnp.take_along_axis(X24 + i * 1e-30, ri[:, :, None], axis=1)
            * jnp.take_along_axis(X24, ci[:, :, None], axis=1)))
    print(f"{'':>44}-> {2 * gb24 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        "sorted segment_sum [K] -> [n]",
        lambda i: jnp.sum(jax.vmap(
            lambda d, ix: jax.ops.segment_sum(
                d, ix, num_segments=n, indices_are_sorted=True))(
            vals + i * 1e-30, ri)))
    print(f"{'':>44}-> {K * 4 / 1e9 / dt:6.1f} GB/s effective")

    bounds_np = np.searchsorted(rows, np.arange(n + 1)).astype(np.int32)
    bounds = jnp.asarray(bounds_np[None])
    from lorads_tpu.ops.pattern import bounded_segment_sum, \
        comp_segment_sum

    dt = bench_loop(
        "bounded segsum (cumsum+2 gathers)",
        lambda i: jnp.sum(bounded_segment_sum(vals + i * 1e-30, bounds)))
    print(f"{'':>44}-> {K * 4 / 1e9 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        "compensated segsum f32 (pair scan)",
        lambda i: jnp.sum(comp_segment_sum(vals + i * 1e-30, bounds)))
    print(f"{'':>44}-> {K * 4 / 1e9 / dt:6.1f} GB/s effective")

    vals64 = vals.astype(jnp.float64)
    dt = bench_loop(
        "compensated segsum f64-in (Dekker)",
        lambda i: jnp.sum(comp_segment_sum(
            vals64 + i * 1e-30, bounds)).astype(jnp.float32))
    print(f"{'':>44}-> {K * 8 / 1e9 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        "sorted segment_sum f64 [K] -> [n]",
        lambda i: jnp.sum(jax.vmap(
            lambda d, ix: jax.ops.segment_sum(
                d, ix, num_segments=n, indices_are_sorted=True))(
            vals64 + i * 1e-30, ri)).astype(jnp.float32))
    print(f"{'':>44}-> {K * 8 / 1e9 / dt:6.1f} GB/s effective")

    # [K, r]-shaped segment sum (the w_mul shape: values x factor rows)
    vr = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, K, r)), jnp.float32)
    dt = bench_loop(
        f"sorted segment_sum [K,{r}] -> [n,{r}]",
        lambda i: jnp.sum(jax.vmap(
            lambda d, ix: jax.ops.segment_sum(
                d, ix, num_segments=n, indices_are_sorted=True))(
            vr + i * 1e-30, ri)))
    print(f"{'':>44}-> {gb24 / dt:6.1f} GB/s effective")

    dt = bench_loop(
        f"compensated segsum [K,{r}] f32",
        lambda i: jnp.sum(comp_segment_sum(vr + i * 1e-30, bounds)))
    print(f"{'':>44}-> {gb24 / dt:6.1f} GB/s effective")

    W = jnp.asarray(rng.standard_normal((512, 2048)), jnp.float32)
    T = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    dt = bench_loop(
        "one 512x2048x128 window matmul",
        lambda i: jnp.sum((W + i * 1e-30) @ T))
    n_windows = max(n // 512, 1)
    print(f"{'':>44}-> x{n_windows} windows = "
          f"{dt * n_windows * 1e3:.3f} ms/full-pattern pass")


if __name__ == "__main__":
    main()
