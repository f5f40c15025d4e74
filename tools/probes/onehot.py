"""EXPERIMENTAL (unwired): one-hot MXU window kernels — sorted
segment-sum / sorted row-gather as dense matmuls.

Status: a correct, unit-tested reference kernel that is NOT used by
the production path.  Honest `device_get` timing measured every
compiling variant at parity with XLA's plain sorted segment-sum
(1.75-4.5 ms on the n=20000/K=80000/r=24 scatter, nowhere near the
~0.5 ms bar), so wiring it in buys nothing — see docs/DESIGN.md
"Kernel architecture" §4 for the full negative result.  Revisit only
with an on-chip compiler and a fused producer-consumer design.

TPU has no fast scatter or gather: XLA lowers both to ~20 ns/row
scalar-issue loops.  But when the ids are SORTED, the rows feeding any
CT-wide output tile (scatter) — or the source rows feeding any
KT-wide tile of gathered output (gather) — live in one contiguous
window of the other operand.  The reduction then tiles into dense
one-hot matmuls

    scatter:  out[CT seg tile, r] = onehot[W2, CT]^T-contraction vals[W2, r]
    gather:   out[KT id tile, r]  = onehot[KT, W2] @ X[W2 window, r]

with the one-hot generated on the fly from an iota comparison (VPU)
and the products on the MXU.  The per-tile window offset rides Pallas
scalar prefetch; every dynamic block offset is on the SUBLANE axis and
the ids array is laid out [K, 1] (sublane-major) — the combination the
Mosaic compiler accepts (lane-axis multi-window offsets on
multi-sublane arrays crash it; see tools/microbench_gather5/6.py).

Precision: the one-hot factor is exactly representable in bf16 and
bf16 x bf16 accumulates in f32, so splitting the value operand into
bf16 planes (hi/mid/lo carrying f32's 24-bit mantissa, computed
in-kernel from the f32 window) reproduces exact-f32 products in 3 MXU
passes ("bf16x3"); "bf16x2" (~2^-16 relative) and plain f32 HIGHEST
are also offered.

The reference computes the same reductions serially
(/root/reference/src_semi/data/lorads_sdp_data.c:491-587 row axpys);
this is their TPU-native formulation.

Constraints (checked by the planner, XLA fallback otherwise):
  * ids sorted and within [0, n); one block (no batch axis);
  * scatter: no CT consecutive segments draw from > WT input rows;
  * gather: no KT consecutive ids span beyond a 2*WT aligned window.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Host-built window plan for one sorted-id shape.

    ``wblock`` (device int32 [n_tiles]) holds the WT-unit window block
    index each output tile reads (it and its successor: coverage 2*WT).
    """

    ok: bool = dataclasses.field(metadata=dict(static=True))
    kind: str = dataclasses.field(metadata=dict(static=True))  # scatter|gather
    n: int = dataclasses.field(metadata=dict(static=True))     # segment space
    K: int = dataclasses.field(metadata=dict(static=True))     # id count
    CT: int = dataclasses.field(metadata=dict(static=True))    # out tile
    WT: int = dataclasses.field(metadata=dict(static=True))    # window unit
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    K_pad: int = dataclasses.field(metadata=dict(static=True))
    wblock: jnp.ndarray = None
    ids_pad: jnp.ndarray = None   # int32 [K_pad, 1] padded sorted ids


_BAD = WindowPlan(ok=False, kind="none", n=0, K=0, CT=0, WT=0,
                  n_pad=0, K_pad=0)

_MAX_WT = 1 << 14   # 16K-row window = 2 x 8 MB f32 @ r=128; VMEM bound


def plan_sorted_scatter(ids: np.ndarray, n: int, CT: int = 256,
                        WT: int = 0) -> WindowPlan:
    """Plan segment_sum(vals[K, r], sorted ids) -> [n, r].

    Output tiles cover CT segments; WT=0 picks the smallest power-of-2
    window covering the worst tile (min 512)."""
    ids = np.asarray(ids)
    K = int(ids.size)
    if K == 0 or np.any(np.diff(ids) < 0):
        return _BAD
    n_pad = _ru(max(n, CT), CT)
    nt = n_pad // CT
    starts = np.searchsorted(ids, np.arange(nt) * CT)
    ends = np.searchsorted(ids, np.arange(nt) * CT + CT)
    span = int((ends - starts).max()) if nt else 0
    if WT == 0:
        WT = 512
        while WT < span:
            WT *= 2
    if span > WT or WT > _MAX_WT:
        return _BAD
    K_pad = _ru(K, WT) + WT          # spare block: wblock+1 always valid
    wblock = np.minimum(starts // WT, K_pad // WT - 2).astype(np.int32)
    ids_pad = np.full((K_pad, 1), n_pad + 7, np.int32)
    ids_pad[:K, 0] = ids
    return WindowPlan(ok=True, kind="scatter", n=n, K=K, CT=CT, WT=WT,
                      n_pad=n_pad, K_pad=K_pad,
                      wblock=jnp.asarray(wblock),
                      ids_pad=jnp.asarray(ids_pad))


def plan_sorted_gather(ids: np.ndarray, n: int, KT: int = 256,
                       WT: int = 0) -> WindowPlan:
    """Plan X[n, r][ids] -> [K, r] for sorted ids.

    Output tiles cover KT consecutive ids; the 2*WT window (aligned to
    WT) must cover the span of source rows those ids touch."""
    ids = np.asarray(ids)
    K = int(ids.size)
    if K == 0 or np.any(np.diff(ids) < 0) or int(ids.max()) >= n:
        return _BAD
    K_pad = _ru(K, KT)
    nt = K_pad // KT
    firsts = ids[np.minimum(np.arange(nt) * KT, K - 1)]
    lasts = ids[np.minimum((np.arange(nt) + 1) * KT - 1, K - 1)]
    if WT == 0:
        WT = 512
        while WT <= _MAX_WT and not np.all(lasts < (firsts // WT + 2) * WT):
            WT *= 2
    if WT > _MAX_WT or not np.all(lasts < (firsts // WT + 2) * WT):
        return _BAD
    n_pad = _ru(n, WT) + WT
    wblock = np.minimum(firsts // WT, n_pad // WT - 2).astype(np.int32)
    ids_pad = np.full((K_pad, 1), n_pad + 7, np.int32)
    ids_pad[:K, 0] = ids
    return WindowPlan(ok=True, kind="gather", n=n, K=K, CT=KT, WT=WT,
                      n_pad=n_pad, K_pad=K_pad,
                      wblock=jnp.asarray(wblock),
                      ids_pad=jnp.asarray(ids_pad))


def _planes(v: jnp.ndarray, mode: str):
    """In-kernel f32 -> bf16 plane split (exact mantissa recomposition)."""
    if mode == "f32":
        return (v,)
    hi = v.astype(jnp.bfloat16)
    rem = v - hi.astype(jnp.float32)
    if mode == "bf16x2":
        return hi, rem.astype(jnp.bfloat16)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_planes(oh_bool, v, dn, mode):
    """Sum of one-hot matmuls over the value planes (f32 accumulate)."""
    if mode == "f32":
        oh = oh_bool.astype(jnp.float32)
        return jax.lax.dot_general(oh, v, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    oh = oh_bool.astype(jnp.bfloat16)
    acc = None
    for p in _planes(v, mode):
        part = jax.lax.dot_general(oh, p, dn,
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _scatter_kernel(wb_ref, id0, id1, v0, v1, o_ref, *, CT, WT, mode):
    i = pl.program_id(0)
    W2 = 2 * WT
    ids = jnp.concatenate([id0[:], id1[:]], axis=0)            # (W2, 1)
    v = jnp.concatenate([v0[:], v1[:]], axis=0)                # (W2, r)
    segs = i * CT + jax.lax.broadcasted_iota(jnp.int32, (W2, CT), 1)
    dn = (((0,), (0,)), ((), ()))                              # (CT, r)
    o_ref[:] = _dot_planes(ids == segs, v, dn, mode)


def sorted_scatter(vals: jnp.ndarray, plan: WindowPlan,
                   mode: str = "bf16x3", interpret: bool = False
                   ) -> jnp.ndarray:
    """segment_sum(vals [K, r], plan.ids) -> [plan.n, r].

    The ids live in the plan (static per problem).  Callers must check
    ``plan.ok`` and fall back to XLA segment-sum themselves."""
    assert plan.ok and plan.kind == "scatter"
    K, r = vals.shape
    out_dtype = vals.dtype
    CT, WT = plan.CT, plan.WT
    vals = vals.astype(jnp.float32)
    if K != plan.K_pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((plan.K_pad - K, r), jnp.float32)])
    nt = plan.n_pad // CT
    w_spec0 = lambda i, wb: (wb[i], 0)
    w_spec1 = lambda i, wb: (wb[i] + 1, 0)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, CT=CT, WT=WT, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((WT, 1), w_spec0, memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, 1), w_spec1, memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, r), w_spec0, memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, r), w_spec1, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CT, r), lambda i, wb: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_pad, r), jnp.float32),
        interpret=interpret,
    )(plan.wblock, plan.ids_pad, plan.ids_pad, vals, vals)
    return out[: plan.n].astype(out_dtype)


def _gather_kernel(wb_ref, ids, v0, v1, o_ref, *, KT, WT, mode):
    i = pl.program_id(0)
    W2 = 2 * WT
    wstart = wb_ref[i] * WT
    X = jnp.concatenate([v0[:], v1[:]], axis=0)                # (W2, r)
    rows = wstart + jax.lax.broadcasted_iota(jnp.int32, (KT, W2), 1)
    dn = (((1,), (0,)), ((), ()))                              # (KT, r)
    o_ref[:] = _dot_planes(ids[:] == rows, X, dn, mode)


def sorted_gather(X: jnp.ndarray, plan: WindowPlan,
                  mode: str = "bf16x3", interpret: bool = False
                  ) -> jnp.ndarray:
    """X[n, r] rows at plan.ids (sorted) -> [plan.K, r]."""
    assert plan.ok and plan.kind == "gather"
    n, r = X.shape
    out_dtype = X.dtype
    KT, WT = plan.CT, plan.WT
    X = X.astype(jnp.float32)
    if n != plan.n_pad:
        X = jnp.concatenate(
            [X, jnp.zeros((plan.n_pad - n, r), jnp.float32)])
    nt = plan.K_pad // KT
    w_spec0 = lambda i, wb: (wb[i], 0)
    w_spec1 = lambda i, wb: (wb[i] + 1, 0)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, KT=KT, WT=WT, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((KT, 1), lambda i, wb: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, r), w_spec0, memory_space=pltpu.VMEM),
                pl.BlockSpec((WT, r), w_spec1, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KT, r), lambda i, wb: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.K_pad, r), jnp.float32),
        interpret=interpret,
    )(plan.wblock, plan.ids_pad, X, X)
    return out[: plan.K].astype(out_dtype)
