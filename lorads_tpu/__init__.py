"""lorads_tpu — a TPU-native low-rank SDP solver (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of LoRADS (COPT-Public/LoRADS):
a two-phase first-order solver for standard-form semidefinite programs

    min <C, X>  s.t.  A(X) = b,  X >= 0 (PSD),

optionally with one LP (nonnegative-orthant) block.  X is never formed:
it is factored X = R R^T (Burer-Monteiro) with rank r = O(log n).

Phase I  (ALM):  L-BFGS with an exact quartic line search on the
                 augmented Lagrangian in R.
Phase II (ADMM): splitting X = U V^T, alternating U/V updates, each a
                 matrix-free CG solve, plus dual ascent.

The compute path is JAX (jit / vmap / lax loops) designed for TPU:
constraint applications A(UV^T) are batched sparse-dense contractions on
a per-block union sparsity pattern, factor updates are MXU matmuls, and
multi-block problems shard over a `jax.sharding.Mesh`.

Reference parity: docstrings cite /root/reference/src_semi/<file>:<line>.
"""

import jax as _jax

# The algorithms (exact line search, ill-conditioned CG at rho up to
# 1e6, DIMACS at 1e-7) need f64 accumulation; TPUs execute f64 as
# software pairs, and the production f32 path is opt-in via
# LoradsParams(dtype="f32").
_jax.config.update("jax_enable_x64", True)

# TPU f32 matmuls/dots truncate inputs to bf16 by default; every dot
# here is DIMACS-critical (line-search coefficients, L-BFGS curvature,
# CG reductions), so force full-precision accumulation globally.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: solver graphs are large (whole ALM /
# ADMM loops) and TPU backends may compile remotely; caching across
# processes turns minutes of warm-up into milliseconds.  Opt out with
# LORADS_TPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("LORADS_TPU_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "LORADS_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "lorads_tpu_xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:
        pass

from lorads_tpu.config import LoradsParams, SolverStatus
from lorads_tpu.core.problem import (SDPProblem, merge_problems,
                                     split_objectives)
from lorads_tpu.io.sdpa import read_sdpa, write_sdpa
from lorads_tpu.alg.solver import LoradsSolver, solve

__version__ = "0.1.0"

__all__ = [
    "LoradsParams",
    "SolverStatus",
    "SDPProblem",
    "merge_problems",
    "split_objectives",
    "read_sdpa",
    "write_sdpa",
    "LoradsSolver",
    "solve",
]
