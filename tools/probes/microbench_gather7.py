"""Clean timings for ops/onehot.py (v2, sublane formulation) vs XLA.

Shapes match the maxcut hot loop: K pattern slots over n, r factor
columns.  Sweeps precision mode and tile size.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather7.py
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

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import onehot


def trial(name, fn, check=None, reps=30):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:>44}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>44}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def bench_shape(n, K, r):
    rng = np.random.default_rng(0)
    print(f"--- n={n} K={K} r={r} ---", flush=True)
    ids = np.sort(rng.integers(0, n, K)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    ids_d = jnp.asarray(ids)

    seg = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    ref_sc = seg(vals, ids_d)
    trial("XLA segment_sum", lambda: seg(vals, ids_d))
    g = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
    ref_g = g(X, ids_d)
    trial("XLA row gather", lambda: g(X, ids_d))

    for CT in (128, 256, 512):
        plan = onehot.plan_sorted_scatter(ids, n, CT=CT)
        if not plan.ok:
            print(f"   scatter CT={CT}: plan rejected", flush=True)
            continue
        for mode in ("bf16x2", "bf16x3", "f32"):
            f = jax.jit(functools.partial(onehot.sorted_scatter,
                                          plan=plan, mode=mode))
            trial(f"onehot scatter CT={CT} WT={plan.WT} {mode}",
                  lambda f=f: f(vals), check=ref_sc)

    for KT in (128, 256, 512, 1024):
        plan = onehot.plan_sorted_gather(ids, n, KT=KT)
        if not plan.ok:
            print(f"   gather KT={KT}: plan rejected", flush=True)
            continue
        for mode in ("bf16x2", "bf16x3", "f32"):
            f = jax.jit(functools.partial(onehot.sorted_gather,
                                          plan=plan, mode=mode))
            trial(f"onehot gather KT={KT} WT={plan.WT} {mode}",
                  lambda f=f: f(X), check=ref_g)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    bench_shape(20000, 80000, 24)
    bench_shape(50000, 250000, 24)


if __name__ == "__main__":
    main()
