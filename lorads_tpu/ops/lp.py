"""LP (nonnegative-orthant) block kernels.

The LP block is a diagonal PSD block factored rank-1 per column:
x_j = u_j * v_j (reference lorads_lp_conic.c:172-217).  All per-column
loops become vectorized gathers/segment-sums over the flattened LP
constraint COO.

Both segment sums carry statically sorted entry copies + boundary
arrays (all dtypes since round 5) so the sums take the scatter-free
compensated-scan path (ops/pattern.py comp_segment_sum).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lorads_tpu.core.problem import LPBlockData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LPData:
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    m_glob: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    obj: jnp.ndarray        # [n_cols]
    a_con: jnp.ndarray      # int32 [nnz]
    a_col: jnp.ndarray      # int32 [nnz]
    a_val: jnp.ndarray      # [nnz]
    col_nrm2sq: jnp.ndarray  # [n_cols], cached ||a_col||^2
                             # (lorads_lp_conic.c:106-107)
    # statically sorted copies + segment boundaries (scatter-free
    # fast path; built at every dtype since round 5 — COMP_CUMSUM)
    a_val_cs: jnp.ndarray = None   # [nnz] vals in con order
    a_col_cs: jnp.ndarray = None   # int32 [nnz] cols in con order
    bnd_con: jnp.ndarray = None    # int32 [m_glob+1]
    a_val_ls: jnp.ndarray = None   # [nnz] vals in col order
    a_con_ls: jnp.ndarray = None   # int32 [nnz] cons in col order
    bnd_col: jnp.ndarray = None    # int32 [n_cols+1]
    # padded per-column layout for the Gauss-Seidel column sweep
    # (admm._update_lp_var_gs; params.lp_gauss_seidel): column j's
    # entries at [j, :], constraint ids padded to m_glob (reads hit a
    # zero slot, scatters drop), values padded 0.  Memory is
    # n_cols * max_nnz_col — fine for the sparse LP blocks LoRADS
    # targets; a dense-column instance would want a CSR scan instead.
    max_nnz_col: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    pc_con: jnp.ndarray = None     # int32 [n_cols, max_nnz_col]
    pc_val: jnp.ndarray = None     # [n_cols, max_nnz_col]


def build_lp_data(lp: LPBlockData, dtype) -> LPData:
    f = lambda x: jnp.asarray(x, dtype=dtype)
    i32 = lambda x: jnp.asarray(x, dtype=jnp.int32)
    # sorted copies + boundaries, built at every dtype (round 5:
    # the compensated pair scan serves f32 sums too)
    cp = np.argsort(lp.a_con, kind="stable")
    lps = np.argsort(lp.a_col, kind="stable")
    con_s = np.asarray(lp.a_con)[cp]
    col_s = np.asarray(lp.a_col)[lps]
    bounds = dict(
        a_val_cs=f(np.asarray(lp.a_val)[cp]),
        a_col_cs=i32(np.asarray(lp.a_col)[cp]),
        bnd_con=i32(np.searchsorted(
            con_s, np.arange(lp.m + 1)).astype(np.int32)),
        a_val_ls=f(np.asarray(lp.a_val)[lps]),
        a_con_ls=i32(np.asarray(lp.a_con)[lps]),
        bnd_col=i32(np.searchsorted(
            col_s, np.arange(lp.n_cols + 1)).astype(np.int32)),
    )
    # padded per-column layout (Gauss-Seidel sweep; see LPData)
    counts = np.bincount(np.asarray(lp.a_col), minlength=lp.n_cols)
    max_nnz_col = max(int(counts.max()) if counts.size else 0, 1)
    pc_con = np.full((lp.n_cols, max_nnz_col), lp.m, np.int32)
    pc_val = np.zeros((lp.n_cols, max_nnz_col))
    pos = np.zeros(lp.n_cols, np.int64)
    for k in range(int(lp.a_val.size)):
        j = int(lp.a_col[k])
        pc_con[j, pos[j]] = lp.a_con[k]
        pc_val[j, pos[j]] = lp.a_val[k]
        pos[j] += 1
    return LPData(
        n_cols=lp.n_cols, m_glob=lp.m, nnz=int(lp.a_val.size),
        obj=f(lp.obj),
        a_con=i32(lp.a_con),
        a_col=i32(lp.a_col),
        a_val=f(lp.a_val),
        col_nrm2sq=f(lp.col_nrm2_square()),
        max_nnz_col=max_nnz_col,
        pc_con=i32(pc_con), pc_val=f(pc_val),
        **bounds,
    )


def _bounded_1d(data: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    from lorads_tpu.ops import pattern as pat
    f = (pat.comp_segment_sum if pat.COMP_CUMSUM
         else pat.bounded_segment_sum)
    return f(data[None], bounds[None])[0]


def _use_bounds(data: jnp.ndarray, bounds) -> bool:
    # delegate to the single eligibility predicate in ops/pattern.py
    from lorads_tpu.ops import pattern as pat
    return pat._use_bounds(data[None], bounds) if bounds is not None \
        else False


def constr_vals(lpd: LPData, uv: jnp.ndarray) -> jnp.ndarray:
    """A_lp(diag(uv)) -> global [m].  Reference: lp_cone_AUV."""
    if _use_bounds(lpd.a_val_cs, lpd.bnd_con):
        contrib = lpd.a_val_cs * uv[lpd.a_col_cs]
        return _bounded_1d(contrib, lpd.bnd_con)
    contrib = lpd.a_val * uv[lpd.a_col]
    return jax.ops.segment_sum(contrib, lpd.a_con,
                               num_segments=lpd.m_glob)


def obj_inner(lpd: LPData, uv: jnp.ndarray) -> jnp.ndarray:
    """<c, uv> (lp_cone_objAUV, lorads_lp_conic.c:193-202)."""
    return jnp.dot(lpd.obj, uv)


def adjoint_cols(lpd: LPData, w: jnp.ndarray) -> jnp.ndarray:
    """a_j^T w for every column j -> [n_cols].

    Reference: lp_cone_Wsum per column (lorads_lp_conic.c:211-213).
    """
    if _use_bounds(lpd.a_val_ls, lpd.bnd_col):
        contrib = lpd.a_val_ls * w[lpd.a_con_ls]
        return _bounded_1d(contrib, lpd.bnd_col)
    contrib = lpd.a_val * w[lpd.a_con]
    return jax.ops.segment_sum(contrib, lpd.a_col,
                               num_segments=lpd.n_cols)
