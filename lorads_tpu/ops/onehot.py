"""One-hot MXU window scatter: segment-sum with sorted ids as matmuls.

TPU has no fast scatter; XLA's segment-sum runs at ~20 ns/row.  When
the segment ids are SORTED, the rows feeding any CT-wide output tile
live in one contiguous window of the input, so the segment-sum tiles
into dense one-hot matmuls

    out[tile of CT segments, r] = onehot[CT, WT] @ vals[window of WT, r]

with onehot generated on the fly from an iota comparison (VPU) and the
products running on the MXU — no dynamic indexing except the
per-tile window offset, which rides Pallas scalar prefetch.

Precision: the one-hot factor is exactly representable in bf16, and
bf16 x bf16 products accumulate in f32, so splitting vals into three
bf16 planes (hi/mid/lo, together carrying f32's 24-bit mantissa) makes
the matmul path as accurate as a plain f32 summation at 3 MXU passes
(HIGHEST-precision f32 would cost 6).

The reference computes the same reductions serially
(/root/reference/src_semi/data/lorads_sdp_data.c:491-504 row axpys);
this is their TPU-native formulation.

Constraints (checked by the planner, with XLA segment-sum fallback):
  * ids sorted and within [0, n); one block (no batch axis);
  * max rows per window <= WT (skewed segments fall back);
  * n, WT multiples of 128; WT covers window + 128 alignment slack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Host-side plan for one sorted-scatter shape."""

    n_pad: int          # padded segment count (multiple of CT)
    K_pad: int          # padded id/value length (multiple of WT)
    CT: int             # output tile (segments per grid step)
    WT: int             # input window per tile
    wblock: np.ndarray  # int32 [n_pad // CT] window block index
    ok: bool            # windows fit; pallas path usable


def plan_sorted_scatter(ids: np.ndarray, n: int, CT: int = 256,
                        WT: int = 2048) -> ScatterPlan:
    """Build the window plan for sorted ids (host, once per problem).

    Each output tile reads TWO consecutive WT-blocks of the input
    (window granularity WT, coverage 2*WT), so the plan holds whenever
    no CT segments span more than WT input rows."""
    ids = np.asarray(ids)
    n_pad = _ru(max(n, CT), CT)
    nt = n_pad // CT
    starts = np.searchsorted(ids, np.arange(nt) * CT)
    ends = np.searchsorted(ids, np.arange(nt) * CT + CT)
    ok = bool(np.all(ends - starts <= WT)) if ids.size else True
    wblock = (starts // WT).astype(np.int32)
    # one spare block so wblock+1 is always a valid second window
    K_pad = _ru(max(int(ids.size), 1), WT) + WT
    wblock = np.minimum(wblock, K_pad // WT - 2).astype(np.int32)
    return ScatterPlan(n_pad=n_pad, K_pad=K_pad, CT=CT, WT=WT,
                       wblock=wblock, ok=ok)


def _pad_ids(ids: jnp.ndarray, plan: ScatterPlan, n: int) -> jnp.ndarray:
    K = ids.shape[0]
    if K == plan.K_pad:
        return ids
    # padding ids point past every segment so they never match
    return jnp.concatenate(
        [ids, jnp.full((plan.K_pad - K,), plan.n_pad + 7, ids.dtype)])


def _scatter_kernel(wb_ref, id0_ref, id1_ref, vh0_ref, vh1_ref,
                    vm0_ref, vm1_ref, vl0_ref, vl1_ref, o_ref, *,
                    CT: int, WT: int):
    i = pl.program_id(0)
    segs = i * CT + jax.lax.broadcasted_iota(jnp.int32, (CT, WT), 0)
    oh0 = (segs == id0_ref[:].reshape(1, WT)).astype(jnp.bfloat16)
    oh1 = (segs == id1_ref[:].reshape(1, WT)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    acc = None
    for oh, refs in ((oh0, (vh0_ref, vm0_ref, vl0_ref)),
                     (oh1, (vh1_ref, vm1_ref, vl1_ref))):
        for v in refs:
            part = jax.lax.dot_general(
                oh, v[:], dn, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    o_ref[:] = acc


def _split3(v: jnp.ndarray):
    """f32 -> three bf16 planes whose sum reproduces the f32 mantissa."""
    hi = v.astype(jnp.bfloat16)
    rem = v - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def sorted_scatter(vals: jnp.ndarray, ids: jnp.ndarray, n: int,
                   plan: ScatterPlan, interpret: bool = False
                   ) -> jnp.ndarray:
    """segment_sum(vals [K, r], sorted ids [K]) -> [n, r] via one-hot
    MXU window matmuls.  Falls back to XLA segment-sum when the plan
    rejected the shape."""
    if not plan.ok:
        return jax.ops.segment_sum(vals, ids, num_segments=n,
                                   indices_are_sorted=True)
    K, r = vals.shape
    CT, WT = plan.CT, plan.WT
    ids_p = _pad_ids(ids.astype(jnp.int32), plan, n)
    if K != plan.K_pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((plan.K_pad - K, r), vals.dtype)])
    vh, vm, vl = _split3(vals)
    nt = plan.n_pad // CT

    id_spec0 = pl.BlockSpec((1, WT), lambda i, wb: (0, wb[i]),
                            memory_space=pltpu.VMEM)
    id_spec1 = pl.BlockSpec((1, WT), lambda i, wb: (0, wb[i] + 1),
                            memory_space=pltpu.VMEM)
    v_spec0 = pl.BlockSpec((WT, r), lambda i, wb: (wb[i], 0),
                           memory_space=pltpu.VMEM)
    v_spec1 = pl.BlockSpec((WT, r), lambda i, wb: (wb[i] + 1, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, CT=CT, WT=WT),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[id_spec0, id_spec1, v_spec0, v_spec1,
                      v_spec0, v_spec1, v_spec0, v_spec1],
            out_specs=pl.BlockSpec((CT, r), lambda i, wb: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_pad, r), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.wblock), ids_p[None, :], ids_p[None, :],
      vh, vh, vm, vm, vl, vl)
    return out[:n].astype(vals.dtype)
