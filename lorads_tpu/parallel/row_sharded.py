"""Factor-row (tensor-parallel-style) sharding for very large dense cones.

The third sharding axis (after block-axis dp in sharded.py and
pattern-axis sp in pattern_sharded.py): the O(n^2) dense objects —
sym(UV^T) and W = C + A^*(w) — are sharded by ROW SLAB over the mesh,
i.e. the TPU equivalent of a row-distributed dsyr2k/dsymm
(reference dense kernels: lorads_alg_common.c:50-67 via fds_syr2k,
lorads_sdp_data.c:646-671 via dsymm).  Factors U, V (n x r, small)
stay replicated; device d owns rows [d*n_loc, (d+1)*n_loc) of every
n x n intermediate and exactly the constraint entries whose row index
falls in its slab.

Per gradient step the only cross-device traffic is:
  * psum of the per-constraint inner products        [m_loc]
  * all_gather of the disjoint W.U row slabs         [n_loc, r] each
— both ride ICI.  The n x n matrices are never materialized on one
device, so the memory ceiling for a single huge dense cone becomes
n^2/D per chip.

Entries are stored in FULL symmetric form (lower-tri entries + their
mirrors), which makes the inner-product weights and the W scatter the
same entry list: <A, X> = sum v * X[r, c] over full entries, and
W[r, c] += w * v scatters the exact symmetric W.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lorads_tpu.core.presolve import BlockPlan

AXIS = "rows"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowShardData:
    """Static per-device row-slab data, leading axis D (the mesh axis)."""

    # -- static --
    D: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))       # true dim
    n_loc: int = dataclasses.field(metadata=dict(static=True))   # slab rows
    m_loc: int = dataclasses.field(metadata=dict(static=True))
    m_glob: int = dataclasses.field(metadata=dict(static=True))
    nnz_loc: int = dataclasses.field(metadata=dict(static=True))
    # -- arrays, leading axis D --
    row0: jnp.ndarray       # int32 [D]      first global row of the slab
    c_slab: jnp.ndarray     # f     [D, n_loc, n]  C rows (full symmetric)
    a_lin: jnp.ndarray      # int32 [D, nnz] local_row * n + col
    a_con: jnp.ndarray      # int32 [D, nnz] local constraint slot (pad->m_loc)
    a_val: jnp.ndarray      # f     [D, nnz] full-symmetric entry values
    loc2glob: jnp.ndarray   # int32 [D, m_loc] global constraint ids

    @property
    def n_pad(self) -> int:
        return self.D * self.n_loc


def build_row_shards(plan: BlockPlan, m_glob: int, n_devices: int,
                     dtype) -> RowShardData:
    """Partition one block's rows into n_devices contiguous slabs.

    Works for any BlockPlan (the union pattern is expanded to full
    symmetric entries); intended for dense-mode single large cones
    where the n x n intermediates dominate memory/compute.
    """
    n, D = plan.dim, n_devices
    n_loc = -(-n // D)
    if n_loc * n >= 2 ** 31:
        # a_lin = local_row * n + col is int32 on device (x64 is off
        # in f32 production mode); refuse rather than wrap silently
        raise ValueError(
            f"row-slab linear indices overflow int32 (n_loc*n = "
            f"{n_loc * n:.3g}); use more devices so n/D * n < 2^31")

    # full symmetric entry lists (entry rows decide the owning device)
    er = plan.pat_rows[plan.a_pos]
    ec = plan.pat_cols[plan.a_pos]
    off = er != ec
    rows = np.concatenate([er, ec[off]])
    cols = np.concatenate([ec, er[off]])
    vals = np.concatenate([plan.a_val, plan.a_val[off]])
    cons = np.concatenate([plan.a_con_loc, plan.a_con_loc[off]])

    shard_of = rows // n_loc
    counts = np.bincount(shard_of, minlength=D)
    nnz_loc = max(int(counts.max()), 1)

    a_lin = np.zeros((D, nnz_loc), np.int32)
    a_con = np.full((D, nnz_loc), plan.m_loc, np.int32)
    a_val = np.zeros((D, nnz_loc), np.float64)
    c_slab = np.zeros((D, n_loc, n), np.float64)
    # C on the slab (full symmetric)
    c_r = np.concatenate([plan.pat_rows, plan.pat_cols[plan.pat_rows
                                                       != plan.pat_cols]])
    c_c = np.concatenate([plan.pat_cols, plan.pat_rows[plan.pat_rows
                                                       != plan.pat_cols]])
    c_v = np.concatenate([plan.c_pat, plan.c_pat[plan.pat_rows
                                                 != plan.pat_cols]])
    np.add.at(c_slab, (c_r // n_loc, c_r % n_loc, c_c), c_v)

    for d in range(D):
        sel = shard_of == d
        cnt = int(sel.sum())
        a_lin[d, :cnt] = (rows[sel] - d * n_loc) * n + cols[sel]
        a_con[d, :cnt] = cons[sel]
        a_val[d, :cnt] = vals[sel]

    return RowShardData(
        D=D, n=n, n_loc=n_loc, m_loc=plan.m_loc, m_glob=m_glob,
        nnz_loc=nnz_loc,
        row0=jnp.asarray(np.arange(D, dtype=np.int32) * n_loc),
        c_slab=jnp.asarray(c_slab, dtype),
        a_lin=jnp.asarray(a_lin), a_con=jnp.asarray(a_con),
        a_val=jnp.asarray(a_val, dtype),
        loc2glob=jnp.asarray(np.tile(plan.loc2glob, (D, 1))),
    )


def _pad_rows(X: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    return jnp.pad(X, ((0, n_pad - X.shape[0]), (0, 0)))


def uvt_slab(rs: RowShardData, row0, U: jnp.ndarray, V: jnp.ndarray,
             U_pad: jnp.ndarray, V_pad: jnp.ndarray) -> jnp.ndarray:
    """Row slab of sym(UV^T): 0.5 (U_loc V^T + V_loc U^T) -> [n_loc, n].

    The row-sharded dsyr2k: each device computes only its slab on the
    MXU (reference: fds_syr2k, lorads_dense_opts.c:529-539).
    """
    r = U.shape[1]
    zero = jnp.zeros((), row0.dtype)
    U_loc = jax.lax.dynamic_slice(U_pad, (row0, zero), (rs.n_loc, r))
    V_loc = jax.lax.dynamic_slice(V_pad, (row0, zero), (rs.n_loc, r))
    hi = jax.lax.Precision.HIGHEST
    return 0.5 * (
        jnp.einsum("kr,nr->kn", U_loc, V, precision=hi,
                   preferred_element_type=U.dtype)
        + jnp.einsum("kr,nr->kn", V_loc, U, precision=hi,
                     preferred_element_type=U.dtype))


def slab_constr_vals(rs: RowShardData, slab: jnp.ndarray, a_lin, a_con,
                     a_val) -> jnp.ndarray:
    """Per-device partial <A_i, X> from the slab entries -> [m_loc]
    (psum over the mesh gives the cone totals)."""
    g = slab.reshape(-1)[a_lin] * a_val
    return jax.ops.segment_sum(g, a_con,
                               num_segments=rs.m_loc + 1)[: rs.m_loc]


def slab_build_w(rs: RowShardData, w_loc: jnp.ndarray, a_lin, a_con,
                 a_val, c_slab, include_obj: bool = True) -> jnp.ndarray:
    """W slab = [C +] sum_i w_i A_i restricted to the device's rows."""
    w1 = jnp.concatenate([w_loc, jnp.zeros((1,), w_loc.dtype)])
    contrib = w1[a_con] * a_val
    W = jax.ops.segment_sum(contrib, a_lin,
                            num_segments=rs.n_loc * rs.n)
    W = W.reshape(rs.n_loc, rs.n)
    return c_slab + W if include_obj else W


def make_row_sharded_gradient(mesh: Mesh, rs: RowShardData,
                              c_nrm_inf: float):
    """Row-sharded ALM gradient step for one large dense cone:

        total = A(sym(UU^T));  w = rho (total - b) - dual
        grad  = 2 (C + A^*(w)) U;   cert = ||grad|| / (1 + ||C||_inf)

    All n x n intermediates stay sharded by row slab; factors are
    replicated.  Returns (total [m_glob], grad [n, r], cert).
    """
    dspec = jax.tree.map(lambda _: P(AXIS), rs)

    @partial(shard_map, mesh=mesh,
             in_specs=(dspec, P(), P(), P(), P()),
             out_specs=(P(), P(), P()), check_vma=False)
    def step(rs_d, U, rhs_, dual_, rho_):
        row0 = rs_d.row0[0]
        a_lin, a_con = rs_d.a_lin[0], rs_d.a_con[0]
        a_val, c_slab = rs_d.a_val[0], rs_d.c_slab[0]
        U_pad = _pad_rows(U, rs.n_pad)
        slab = uvt_slab(rs, row0, U, U, U_pad, U_pad)
        vals = jax.lax.psum(
            slab_constr_vals(rs, slab, a_lin, a_con, a_val), AXIS)
        l2g = rs_d.loc2glob[0]
        total = jax.ops.segment_sum(
            vals, l2g, num_segments=rs.m_glob + 1)[: rs.m_glob]
        w = rho_ * (total - rhs_) - dual_
        W = slab_build_w(rs, w[l2g], a_lin, a_con, a_val, c_slab)
        # row-sharded dsymm: W_slab @ U -> disjoint grad rows
        g_loc = 2.0 * jnp.einsum(
            "kn,nr->kr", W, U, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=U.dtype)
        sq = jax.lax.psum(jnp.sum(g_loc * g_loc), AXIS)
        grad = jax.lax.all_gather(g_loc, AXIS, tiled=True)[: rs.n]
        cert = jnp.sqrt(sq) / (1.0 + c_nrm_inf)
        return total, grad, cert

    return step
