"""Multi-chip (shard_map) parity tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lorads_tpu import LoradsParams
from lorads_tpu.alg import aop
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.io import generators
from lorads_tpu.ops import pattern as pat
from lorads_tpu.parallel.sharded import (make_mesh, shard_bucket_axis,
                                         sharded_solver_step)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def _single_device_step(pd, U, V, dual, rho):
    """Unsharded oracle of sharded_solver_step."""
    from lorads_tpu.alg.admm import _update_sdp_var_one

    bk = pd.buckets[0]
    rho = jnp.asarray(rho, pd.rhs.dtype)
    vals = pat.constr_vals(bk, pat.uvt(bk, U.cones[0], V.cones[0]))
    total = pat.scatter_constr(bk, vals)
    w = rho * (total - pd.rhs) - dual
    Wg = pat.build_w(bk, pat.gather_w(bk, w))
    grad = 2.0 * pat.w_mul(bk, Wg, U.cones[0])
    U1, vals, total, _ = _update_sdp_var_one(
        pd, bk, U.cones[0], V.cones[0], vals, total, dual, rho, 1e-10, 50)
    V1, vals, total, _ = _update_sdp_var_one(
        pd, bk, V.cones[0], U1, vals, total, dual, rho, 1e-10, 50)
    return U1, V1, total, grad


def test_sharded_step_matches_single_device(eight_devices):
    problem = generators.random_multiblock(n_blocks=8, dim=12, m=10,
                                           seed=3)
    solver = LoradsSolver(problem, LoradsParams(verbose=False))
    assert len(solver.pd.buckets) == 1
    assert solver.pd.buckets[0].B == 8

    mesh = make_mesh(8)
    U1s, V1s, totals, grads = sharded_solver_step(
        mesh, solver.pd, solver.U, solver.V, solver.dual, 1.0)
    U1, V1, total, grad = _single_device_step(
        solver.pd, solver.U, solver.V, solver.dual, 1.0)

    np.testing.assert_allclose(np.asarray(grads), np.asarray(grad),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(totals), np.asarray(total),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(U1s), np.asarray(U1),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(V1s), np.asarray(V1),
                               rtol=1e-7, atol=1e-8)


def test_shard_bucket_axis_placement(eight_devices):
    problem = generators.random_multiblock(n_blocks=8, dim=12, m=10,
                                           seed=3)
    solver = LoradsSolver(problem, LoradsParams(verbose=False))
    mesh = make_mesh(8)
    pd, U = shard_bucket_axis(mesh, solver.pd, solver.U)
    # block axis spread over 8 devices
    bk = pd.buckets[0]
    assert len(bk.a_val_inner.sharding.device_set) == 8
    assert len(U.cones[0].sharding.device_set) == 8
    # replicated arrays stay replicated
    assert pd.rhs.sharding.is_fully_replicated
