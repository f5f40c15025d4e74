"""Final cost-model probe for the mirror-cache w_mul restructure.

All operands passed as jit ARGUMENTS (closure-captured constants get
re-staged over the axon tunnel per call and poisoned earlier probes).

1. scalar [K] gather at an unsorted permutation (take / take_along_axis)
2. [1, K, r] take_along_axis row gather (the batched take_rows form)
3. sorted vs unsorted segment_sum at B=1 batched form
4. composite: permuted-scalar-mul + sorted segsum (new w_mul term)
   vs unsorted segsum (old w_mul term)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather10.py
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


def trial(name, fn, *args, check=None, reps=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:>46}: FAILED {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>46}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def main():
    n, K, r = 20000, 80000, 24
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} K={K} r={r}", flush=True)

    perm_np = rng.permutation(K).astype(np.int32)
    w_np = rng.standard_normal(K).astype(np.float32)
    perm = jnp.asarray(perm_np)
    w = jnp.asarray(w_np)

    f1 = jax.jit(lambda w, p: jnp.take(w, p))
    trial("scalar take [K] perm", f1, w, perm,
          check=jnp.asarray(w_np[perm_np]))
    f2 = jax.jit(lambda w, p: jnp.take_along_axis(w[None], p[None], 1))
    trial("scalar take_along [1,K] perm", f2, w, perm,
          check=jnp.asarray(w_np[perm_np][None]))

    ids_u_np = rng.integers(0, n, K).astype(np.int32)
    ids_s_np = np.sort(ids_u_np)
    X_np = rng.standard_normal((n, r)).astype(np.float32)
    vals_np = rng.standard_normal((K, r)).astype(np.float32)
    X, vals = jnp.asarray(X_np), jnp.asarray(vals_np)
    ids_u, ids_s = jnp.asarray(ids_u_np), jnp.asarray(ids_s_np)

    f3 = jax.jit(lambda X, i: jnp.take_along_axis(
        X[None], i[None, :, None], 1))
    trial("row take_along [1,K,r] unsorted", f3, X, ids_u,
          check=jnp.asarray(X_np[ids_u_np][None]))

    segs = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=n,
                                     indices_are_sorted=True))
    segu = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=n))
    trial("segsum sorted ids", segs, vals, ids_s)
    trial("segsum unsorted ids", segu, vals, ids_u)
    # sorted data but no compile-time promise: is the speed from the
    # hint or from runtime locality?
    trial("segsum sorted ids, no hint", segu, vals, ids_s)

    # composite: new w_mul upper term = scalar-perm-gather + mul +
    # sorted segsum, vs old = mul + unsorted segsum
    cache_cp = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)

    @jax.jit
    def new_term(w, perm, cache_cp, ids_s):
        w_cp = jnp.take(w, perm)
        return jax.ops.segment_sum(w_cp[:, None] * cache_cp, ids_s,
                                   num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def old_term(w, cache, ids_u):
        return jax.ops.segment_sum(w[:, None] * cache, ids_u,
                                   num_segments=n)

    trial("NEW upper term (perm+mul+sorted segsum)", new_term,
          w, perm, cache_cp, ids_s)
    trial("OLD upper term (mul+unsorted segsum)", old_term,
          w, cache_cp, ids_u)


if __name__ == "__main__":
    main()
