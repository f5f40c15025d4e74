"""Reconcile probe-8 vs probe-10 segment_sum discrepancy and pin the
take vs take_along_axis difference, all in ONE process, interleaved,
with repeats.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather11.py
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


def trial(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:>52}: {dt * 1e6:9.1f} us", flush=True)
    return dt


def main():
    n, K, r = 20000, 80000, 24
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)
    ids_s = jnp.asarray(np.sort(rng.integers(0, n, K)), jnp.int32)
    ids_u = jnp.asarray(rng.integers(0, n, K), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)

    seg_s = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=n,
                                      indices_are_sorted=True))
    seg_u = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=n))
    take = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
    ta = jax.jit(lambda X, i: jnp.take_along_axis(
        X[None], i[None, :, None], 1)[0])
    # .at[].add formulation of scatter
    scat_at = jax.jit(lambda v, i: jnp.zeros((n, r), v.dtype).at[i].add(
        v, indices_are_sorted=True, unique_indices=False))

    for rnd in range(3):
        print(f"--- round {rnd} ---", flush=True)
        trial("segsum sorted", seg_s, vals, ids_s)
        trial("segsum unsorted", seg_u, vals, ids_u)
        trial("at[].add sorted", scat_at, vals, ids_s)
        trial("take sorted", take, X, ids_s)
        trial("take unsorted", take, X, ids_u)
        trial("take_along sorted", ta, X, ids_s)
        trial("take_along unsorted", ta, X, ids_u)


if __name__ == "__main__":
    main()
