"""Unit tests for the EXPERIMENTAL onehot MXU kernels (moved out of
tests/ with the module itself, VERDICT r4 #10 — an unwired negative
result kept for provenance; see docs/DESIGN.md section 4).

Run manually:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
               python -m pytest tools/probes/test_onehot.py -q
"""

import os
import sys

import jax
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import onehot  # noqa: E402


def test_onehot_sorted_scatter_interpret():
    """One-hot MXU window scatter == segment_sum (interpret mode)."""
    rng = np.random.default_rng(3)
    for (K, n, r) in [(5000, 1000, 20), (3000, 517, 7), (64, 2000, 3)]:
        ids = np.sort(rng.integers(0, n, K)).astype(np.int32)
        vals = rng.standard_normal((K, r)).astype(np.float32)
        plan = onehot.plan_sorted_scatter(ids, n)
        assert plan.ok
        ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(ids),
                                  num_segments=n, indices_are_sorted=True)
        denom = max(1e-9, float(jnp.max(jnp.abs(ref))))
        for mode, tol in [("f32", 1e-6), ("bf16x3", 1e-6),
                          ("bf16x2", 1e-4)]:
            out = onehot.sorted_scatter(jnp.asarray(vals), plan,
                                        mode=mode, interpret=True)
            err = float(jnp.max(jnp.abs(out - ref))) / denom
            assert err < tol, (mode, err)


def test_onehot_sorted_gather_interpret():
    """One-hot MXU window gather == row gather (interpret mode)."""
    rng = np.random.default_rng(5)
    for (K, n, r) in [(5000, 1000, 20), (3000, 517, 7), (64, 2000, 3)]:
        ids = np.sort(rng.integers(0, n, K)).astype(np.int32)
        X = rng.standard_normal((n, r)).astype(np.float32)
        plan = onehot.plan_sorted_gather(ids, n)
        assert plan.ok
        ref = X[ids]
        for mode, tol in [("f32", 1e-6), ("bf16x3", 1e-6),
                          ("bf16x2", 1e-4)]:
            out = onehot.sorted_gather(jnp.asarray(X), plan,
                                       mode=mode, interpret=True)
            err = float(np.max(np.abs(np.asarray(out) - ref)))
            assert err / max(1.0, np.abs(ref).max()) < tol, (mode, err)


def test_onehot_skewed_fallback():
    """A segment wider than any window cap makes the planner refuse."""
    rng = np.random.default_rng(4)
    ids = np.sort(np.concatenate([np.zeros(20000, np.int64),
                                  rng.integers(0, 300, 500)]))
    plan = onehot.plan_sorted_scatter(ids, 300, WT=2048)
    assert not plan.ok
    # unsorted ids also refused
    plan2 = onehot.plan_sorted_gather(np.array([5, 3, 1]), 10)
    assert not plan2.ok
