"""Union-pattern constraint kernels (the hot path).

The one load-bearing trick inherited from the reference: X = UV^T is
never materialized globally — `LORADSUVt` computes (UV^T + VU^T)/2 only
at the union sparsity pattern of {C, A_1..A_m} per block
(/root/reference/src_semi/lorads_alg/lorads_alg_common.c:21-68), and all
constraint inner products <A_i, X>, adjoints A^*(w) and products W.R
operate on those pattern values
(/root/reference/src_semi/data/lorads_sdp_conic.c:285-292, 437-445;
lorads_sdp_data.c:491-732).

TPU mapping (all ops batched over the bucket axis B):

* dense-mode blocks: UV^T via MXU matmuls, W.R via MXU matmuls, A(X)
  and A^*(w) via one flat gather / segment-sum each;
* sparse-mode blocks: UV^T on the pattern via row gathers + batched
  row-dot (VPU), W.R via two gather/segment-sum contractions.

Batched segment sums use the index-offset trick (ids + b*S, one global
scatter) which XLA lowers to a single sorted scatter per call.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lorads_tpu.core.presolve import BucketPlan


def batched_segment_sum(data: jnp.ndarray, ids: jnp.ndarray,
                        num_segments: int,
                        sorted_ids: bool = False) -> jnp.ndarray:
    """segment_sum along axis 1 of [B, N, ...] with ids [B, N].

    The block-offset trick keeps global sortedness whenever each
    block's ids are non-decreasing, letting XLA use its sorted-scatter
    fast path (pass sorted_ids=True then — it is a static promise).
    """
    B = data.shape[0]
    offset = (jnp.arange(B, dtype=ids.dtype) * num_segments)[:, None]
    flat_ids = (ids + offset).reshape(-1)
    flat = data.reshape((-1,) + data.shape[2:])
    out = jax.ops.segment_sum(flat, flat_ids,
                              num_segments=B * num_segments,
                              indices_are_sorted=sorted_ids)
    return out.reshape((B, num_segments) + data.shape[2:])


def take_rows(X: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: X [B, n, r], idx [B, K] -> [B, K, r]."""
    return jnp.take_along_axis(X, idx[:, :, None], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketData:
    """Device-resident static data for one bucket of same-shape blocks.

    Shapes: B blocks, dim n (padded), pattern size K, nnz_a constraint
    entries, m_loc local constraint slots.
    """

    # -- static metadata --
    dense: bool = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(metadata=dict(static=True))
    nnz_a: int = dataclasses.field(metadata=dict(static=True))
    m_loc: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))
    m_glob: int = dataclasses.field(metadata=dict(static=True))

    # -- common arrays --
    a_con_loc: jnp.ndarray   # int32 [B, nnz_a]
    a_val_inner: jnp.ndarray  # [B, nnz_a]: a_val * (2 - is_diag)
    glob_idx: jnp.ndarray    # int32 [B, m_loc] (padding -> m_glob)

    # -- sparse-mode arrays (placeholders in dense mode) --
    pat_rows: jnp.ndarray    # int32 [B, K]
    pat_cols: jnp.ndarray    # int32 [B, K]
    c_pat: jnp.ndarray       # [B, K] entry values of C
    c_pat_inner: jnp.ndarray  # [B, K]: c_pat * (2 - is_diag)
    pat_offdiag: jnp.ndarray  # [B, K] 1.0 where row != col else 0.0
    a_pos: jnp.ndarray       # int32 [B, nnz_a] into the pattern

    # -- dense-mode arrays (placeholders in sparse mode) --
    a_lin: jnp.ndarray       # int32 [B, nnz_a] = row*n + col
    a_lin_t: jnp.ndarray     # int32 [B, nnz_a] = col*n + row
    a_val: jnp.ndarray       # [B, nnz_a] raw entry values
    a_val_mirror: jnp.ndarray  # [B, nnz_a] raw values, 0 on diagonal
    c_full: jnp.ndarray      # [B, n, n] dense symmetric C

    # -- pre-permuted copies so every scatter is sorted --
    # build_w: entries re-ordered by pattern slot (free: static perm)
    a_pos_s: jnp.ndarray = None      # int32 [B, nnz_a], sorted per block
    a_con_loc_s: jnp.ndarray = None  # int32 [B, nnz_a]
    a_val_s: jnp.ndarray = None      # [B, nnz_a]
    # w_mul lower pass: pattern re-ordered by row
    row_perm: jnp.ndarray = None     # int32 [B, K]
    pat_rows_s: jnp.ndarray = None   # int32 [B, K], sorted per block
    pat_cols_rp: jnp.ndarray = None  # int32 [B, K] = pat_cols[row_perm]

    # -- static per-block-sortedness promises (XLA sorted-scatter
    #    fast path in batched_segment_sum) --
    a_con_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    a_pos_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    pat_rows_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    pat_cols_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    glob_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True))


def _rows_sorted(x: np.ndarray) -> bool:
    return bool(np.all(np.diff(x, axis=1) >= 0)) if x.size else True


def build_bucket_data(bp: BucketPlan, m_glob: int, dtype) -> BucketData:
    """Convert a host BucketPlan into device arrays."""
    B, n, K = bp.B, bp.n, bp.K
    f = lambda x: jnp.asarray(x, dtype=dtype)
    i32 = lambda x: jnp.asarray(x, dtype=jnp.int32)
    sort_flags = dict(
        a_con_sorted=_rows_sorted(bp.a_con_loc),
        a_pos_sorted=_rows_sorted(bp.a_pos),
        pat_rows_sorted=_rows_sorted(bp.pat_rows),
        pat_cols_sorted=_rows_sorted(bp.pat_cols),
        glob_sorted=(B == 1) and _rows_sorted(bp.glob_idx),
    )
    # static permutations making the remaining scatters sorted
    pperm = np.argsort(bp.a_pos, axis=1, kind="stable")
    rperm = np.argsort(bp.pat_rows, axis=1, kind="stable")
    perms = dict(
        a_pos_s=jnp.asarray(np.take_along_axis(bp.a_pos, pperm, 1),
                            jnp.int32),
        a_con_loc_s=jnp.asarray(
            np.take_along_axis(bp.a_con_loc, pperm, 1), jnp.int32),
        a_val_s=f(np.take_along_axis(bp.a_val, pperm, 1)),
        row_perm=jnp.asarray(rperm, jnp.int32),
        pat_rows_s=jnp.asarray(np.take_along_axis(bp.pat_rows, rperm, 1),
                               jnp.int32),
        pat_cols_rp=jnp.asarray(np.take_along_axis(bp.pat_cols, rperm, 1),
                                jnp.int32),
    )

    is_diag = (bp.pat_rows == bp.pat_cols)
    a_is_diag = np.take_along_axis(is_diag, bp.a_pos, axis=1)
    a_val_inner = bp.a_val * np.where(a_is_diag, 1.0, 2.0)
    c_pat_inner = bp.c_pat * np.where(is_diag, 1.0, 2.0)

    if bp.dense:
        rows = bp.pat_rows.astype(np.int64)
        cols = bp.pat_cols.astype(np.int64)
        a_rows = np.take_along_axis(rows, bp.a_pos.astype(np.int64), axis=1)
        a_cols = np.take_along_axis(cols, bp.a_pos.astype(np.int64), axis=1)
        a_lin = a_rows * n + a_cols
        a_lin_t = a_cols * n + a_rows
        a_val_mirror = np.where(a_rows == a_cols, 0.0, bp.a_val)
        c_full = np.zeros((B, n, n))
        bidx = np.repeat(np.arange(B), K)
        np.add.at(c_full, (bidx, bp.pat_rows.ravel(), bp.pat_cols.ravel()),
                  bp.c_pat.ravel())
        np.add.at(c_full, (bidx, bp.pat_cols.ravel(), bp.pat_rows.ravel()),
                  np.where(is_diag, 0.0, bp.c_pat).ravel())
        z1 = np.zeros((B, 1))
        zi = np.zeros((B, 1), dtype=np.int32)
        return BucketData(
            dense=True, n=n, K=K, nnz_a=bp.nnz_a, m_loc=bp.m_loc, B=B,
            m_glob=m_glob,
            a_con_loc=i32(bp.a_con_loc), a_val_inner=f(a_val_inner),
            glob_idx=i32(bp.glob_idx),
            pat_rows=i32(zi), pat_cols=i32(zi), c_pat=f(z1),
            c_pat_inner=f(z1), pat_offdiag=f(z1), a_pos=i32(zi),
            a_lin=i32(a_lin), a_lin_t=i32(a_lin_t), a_val=f(bp.a_val),
            a_val_mirror=f(a_val_mirror), c_full=f(c_full),
            **perms, **sort_flags,
        )
    z1 = np.zeros((B, 1))
    zi = np.zeros((B, 1), dtype=np.int32)
    return BucketData(
        dense=False, n=n, K=K, nnz_a=bp.nnz_a, m_loc=bp.m_loc, B=B,
        m_glob=m_glob,
        a_con_loc=i32(bp.a_con_loc), a_val_inner=f(a_val_inner),
        glob_idx=i32(bp.glob_idx),
        pat_rows=i32(bp.pat_rows), pat_cols=i32(bp.pat_cols),
        c_pat=f(bp.c_pat), c_pat_inner=f(c_pat_inner),
        pat_offdiag=f(np.where(is_diag, 0.0, 1.0)), a_pos=i32(bp.a_pos),
        a_lin=i32(zi), a_lin_t=i32(zi), a_val=f(bp.a_val),
        a_val_mirror=f(z1), c_full=f(np.zeros((B, 1, 1))),
        **perms, **sort_flags,
    )


# ---------------------------------------------------------------------------
# Kernels.  All take the bucket's factor matrices U, V: [B, n, r].
# ---------------------------------------------------------------------------

def uvt(bk: BucketData, U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """sym(UV^T) = (UV^T + VU^T)/2, full (dense) or on-pattern (sparse).

    Reference: LORADSUVt (lorads_alg_common.c:21-68).
    """
    if bk.dense:
        # HIGHEST: keep full f32 accumulate on the MXU (TPU f32 matmul
        # otherwise truncates inputs to bf16)
        UVt = jnp.einsum("bnr,bmr->bnm", U, V,
                         preferred_element_type=U.dtype,
                         precision=jax.lax.Precision.HIGHEST)
        return 0.5 * (UVt + jnp.swapaxes(UVt, 1, 2))
    ur = take_rows(U, bk.pat_rows)
    vc = take_rows(V, bk.pat_cols)
    uc = take_rows(U, bk.pat_cols)
    vr = take_rows(V, bk.pat_rows)
    return 0.5 * (jnp.sum(ur * vc, -1) + jnp.sum(uc * vr, -1))


def _at_entries(bk: BucketData, uvt_val: jnp.ndarray) -> jnp.ndarray:
    """Pattern values of sym(UV^T) at the constraint entries [B, nnz_a]."""
    if bk.dense:
        flat = uvt_val.reshape(uvt_val.shape[0], bk.n * bk.n)
        return jnp.take_along_axis(flat, bk.a_lin, axis=1)
    return jnp.take_along_axis(uvt_val, bk.a_pos, axis=1)


def constr_vals(bk: BucketData, uvt_val: jnp.ndarray) -> jnp.ndarray:
    """A(sym(UV^T)) for all local constraints -> [B, m_loc].

    Reference: coneAUV / mul_inner_rk_double with the diagonal
    double-count correction (lorads_sdp_data.c:524-587, 698-715).
    """
    contrib = bk.a_val_inner * _at_entries(bk, uvt_val)
    return batched_segment_sum(contrib, bk.a_con_loc, bk.m_loc,
                               sorted_ids=bk.a_con_sorted)


def obj_inner(bk: BucketData, uvt_val: jnp.ndarray) -> jnp.ndarray:
    """<C, sym(UV^T)> per block -> [B].  Reference: objAUV."""
    if bk.dense:
        return jnp.sum(bk.c_full * uvt_val, axis=(1, 2))
    return jnp.sum(bk.c_pat_inner * uvt_val, axis=1)


def scatter_constr(bk: BucketData, vals: jnp.ndarray) -> jnp.ndarray:
    """Scatter local constraint values into the global m-vector.

    Reference: lorads_vec add / the sparse-cone rowIdx reposition
    (lorads_elements.c:7-37, lorads_admm.c:360-372).
    """
    flat = jax.ops.segment_sum(vals.reshape(-1), bk.glob_idx.reshape(-1),
                               num_segments=bk.m_glob + 1,
                               indices_are_sorted=bk.glob_sorted)
    return flat[: bk.m_glob]


def gather_w(bk: BucketData, w: jnp.ndarray) -> jnp.ndarray:
    """Gather a global m-vector at this bucket's constraint slots."""
    w1 = jnp.concatenate([w, jnp.zeros((1,), dtype=w.dtype)])
    return w1[bk.glob_idx]


def build_w(bk: BucketData, w_loc: jnp.ndarray,
            include_obj: bool = True) -> jnp.ndarray:
    """W = [C +] sum_i w_i A_i (as pattern values or full matrices).

    Reference: addObjCoeff + sdpDataWSum (lorads_sdp_conic.c:327-339,
    437-445, 633-641).  ``include_obj=False`` gives the pure adjoint
    A^*(w) used inside the ADMM CG operator (lorads_admm.c:383-385).
    """
    wa = jnp.take_along_axis(w_loc, bk.a_con_loc, axis=1)
    if bk.dense:
        n2 = bk.n * bk.n
        pos = jnp.concatenate([bk.a_lin, bk.a_lin_t], axis=1)
        val = jnp.concatenate([bk.a_val * wa, bk.a_val_mirror * wa], axis=1)
        W = batched_segment_sum(val, pos, n2).reshape(-1, bk.n, bk.n)
        return bk.c_full + W if include_obj else W
    # entries pre-permuted to pattern-slot order: the scatter is sorted
    wa_s = jnp.take_along_axis(w_loc, bk.a_con_loc_s, axis=1)
    W = batched_segment_sum(bk.a_val_s * wa_s, bk.a_pos_s, bk.K,
                            sorted_ids=True)
    return bk.c_pat + W if include_obj else W


def w_mul(bk: BucketData, W: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """W @ X for symmetric W given as build_w output -> [B, n, r].

    Reference: mul_rk (lorads_sdp_data.c:491-504, 646-671).
    """
    if bk.dense:
        return jnp.einsum("bnm,bmr->bnr", W, X,
                          preferred_element_type=X.dtype,
                          precision=jax.lax.Precision.HIGHEST)
    # lower pass in row-sorted order (one extra [K] gather of W buys
    # a sorted scatter); upper pass is already column-sorted
    W_rp = jnp.take_along_axis(W, bk.row_perm, axis=1)
    xc_rp = take_rows(X, bk.pat_cols_rp)
    lower = batched_segment_sum(W_rp[:, :, None] * xc_rp, bk.pat_rows_s,
                                bk.n, sorted_ids=True)
    xr = take_rows(X, bk.pat_rows)
    upper = batched_segment_sum(
        (W * bk.pat_offdiag)[:, :, None] * xr, bk.pat_cols, bk.n,
        sorted_ids=bk.pat_cols_sorted)
    return lower + upper


def auv_into_global(bk: BucketData, U: jnp.ndarray, V: jnp.ndarray):
    """Convenience: (local constraint values, global scatter)."""
    vals = constr_vals(bk, uvt(bk, U, V))
    return vals, scatter_constr(bk, vals)
