"""Where is XLA's sorted gather/segment-sum cliff, and does chunked
windowing (pure XLA, VMEM-sized windows) restore bandwidth?

Sweep (n, K) for sorted ids; then time a scan-based chunked
segment-sum / gather that processes K in slices whose source/dest
window is small.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/microbench_gather8.py
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


def trial(name, fn, check=None, reps=30):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:>46}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    err = ""
    if check is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(out - check))):.2e}"
    print(f"{name:>46}: {dt * 1e6:9.1f} us{err}", flush=True)
    return dt


def sweep_cliff():
    rng = np.random.default_rng(0)
    r = 24
    for n, K in [(20000, 80000), (20000, 200000), (20000, 400000),
                 (35000, 150000), (50000, 100000), (50000, 250000),
                 (100000, 400000)]:
        ids = jnp.asarray(np.sort(rng.integers(0, n, K)), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((K, r)), jnp.float32)
        X = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
        seg = jax.jit(functools.partial(jax.ops.segment_sum,
                                        num_segments=n,
                                        indices_are_sorted=True))
        g = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
        trial(f"segsum n={n} K={K}", lambda: seg(vals, ids))
        trial(f"gather n={n} K={K}", lambda: g(X, ids))


def chunked_segsum(vals, ids_rel, wstarts, n, Wn):
    """vals [C, Kc, r], ids_rel [C, Kc] (in-window ids), wstarts [C]."""
    C, Kc, r = vals.shape

    def body(out, args):
        v, idr, ws = args
        part = jax.ops.segment_sum(v, idr, num_segments=Wn,
                                   indices_are_sorted=True)
        cur = jax.lax.dynamic_slice(out, (ws, 0), (Wn, r))
        return jax.lax.dynamic_update_slice(out, cur + part, (ws, 0)), None

    out = jnp.zeros((n + Wn, r), vals.dtype)
    out, _ = jax.lax.scan(body, out, (vals, ids_rel, wstarts))
    return out[:n]


def chunked_gather(X, ids_rel, wstarts, Wn):
    """X [n+Wn, r]; ids_rel [C, Kc]; -> [C*Kc, r]."""
    r = X.shape[1]
    Kc = ids_rel.shape[1]

    def body(_, args):
        idr, ws = args
        Xw = jax.lax.dynamic_slice(X, (ws, 0), (Wn, r))
        return None, jnp.take(Xw, idr, axis=0)

    _, parts = jax.lax.scan(body, None, (ids_rel, wstarts))
    return parts.reshape(-1, r)


def plan_chunks(ids, n, Kc):
    K = ids.size
    C = (K + Kc - 1) // Kc
    Kp = C * Kc
    ids_p = np.concatenate([ids, np.full(Kp - K, n, ids.dtype)])
    idsc = ids_p.reshape(C, Kc)
    ws = idsc[:, 0].astype(np.int32)
    Wn = int((idsc[:, -1] - ws + 1).max())
    Wn = (Wn + 127) // 128 * 128
    ids_rel = (idsc - ws[:, None]).astype(np.int32)
    return ids_rel, ws, Wn, Kp, K


def bench_chunked():
    rng = np.random.default_rng(1)
    r = 24
    for n, K in [(50000, 250000), (100000, 400000), (20000, 400000)]:
        ids = np.sort(rng.integers(0, n, K))
        vals_np = rng.standard_normal((K, r)).astype(np.float32)
        X_np = rng.standard_normal((n, r)).astype(np.float32)
        ref_sc = None
        for Kc in (25000, 50000, 100000):
            ids_rel, ws, Wn, Kp, _ = plan_chunks(ids, n, Kc)
            C = Kp // Kc
            vals_p = np.zeros((Kp, r), np.float32)
            vals_p[:K] = vals_np
            v = jnp.asarray(vals_p.reshape(C, Kc, r))
            idr = jnp.asarray(ids_rel)
            wsd = jnp.asarray(ws)
            Xp = jnp.asarray(np.concatenate(
                [X_np, np.zeros((Wn, r), np.float32)]))
            f_sc = jax.jit(functools.partial(chunked_segsum, n=n, Wn=Wn))
            f_g = jax.jit(functools.partial(chunked_gather, Wn=Wn))
            if ref_sc is None:
                ref_sc = jax.ops.segment_sum(
                    jnp.asarray(vals_np), jnp.asarray(ids), num_segments=n)
                ref_g = jnp.asarray(X_np[ids])
            trial(f"chunk-segsum n={n} K={K} Kc={Kc} Wn={Wn}",
                  lambda: f_sc(v, idr, wsd), check=ref_sc)
            trial(f"chunk-gather n={n} K={K} Kc={Kc} Wn={Wn}",
                  lambda: f_g(Xp, idr, wsd)[:K], check=ref_g)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    sweep_cliff()
    bench_chunked()


if __name__ == "__main__":
    main()
