"""LP (nonnegative-orthant) block kernels.

The LP block is a diagonal PSD block factored rank-1 per column:
x_j = u_j * v_j (reference lorads_lp_conic.c:172-217).  All per-column
loops become vectorized gathers/segment-sums over the flattened LP
constraint COO.
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


def build_lp_data(lp: LPBlockData, dtype) -> LPData:
    return LPData(
        n_cols=lp.n_cols, m_glob=lp.m, nnz=int(lp.a_val.size),
        obj=jnp.asarray(lp.obj, dtype=dtype),
        a_con=jnp.asarray(lp.a_con, dtype=jnp.int32),
        a_col=jnp.asarray(lp.a_col, dtype=jnp.int32),
        a_val=jnp.asarray(lp.a_val, dtype=dtype),
        col_nrm2sq=jnp.asarray(lp.col_nrm2_square(), dtype=dtype),
    )


def constr_vals(lpd: LPData, uv: jnp.ndarray) -> jnp.ndarray:
    """A_lp(diag(uv)) -> global [m].  Reference: lp_cone_AUV."""
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
    contrib = lpd.a_val * w[lpd.a_con]
    return jax.ops.segment_sum(contrib, lpd.a_col,
                               num_segments=lpd.n_cols)
