"""Head-to-head parity with the reference C binary.

Build the binary once with `sh tools/build_reference.sh` (cmake +
make against this image's BLAS/LAPACK/ARPACK; see the script); the
tests then run non-skipped.  Coverage (VERDICT r1 #7):

* objective parity on small instances,
* full DIMACS-column parity: both solvers must satisfy the SAME
  acceptance bands the reference's status classifier uses
  (main.c:478-487: pinf <= tol, dinf <= 5 tol, gap <= 5 tol),
* a 22-block README-profile-like instance (README.md:52-111 solves a
  22-block m=2964 SDPA file; scaled down for test time),
* a pure-reference-semantics run: every structure-based auto default
  pinned to the reference's fixed value (timesLogRank 2, ALMRhoFactor
  2, lbfgsListLength 2) and the dual-repair extension off.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from lorads_tpu import LoradsParams
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.io import generators
from lorads_tpu.io.sdpa import write_sdpa

REF = os.environ.get("LORADS_REF_BINARY",
                     "/tmp/refbuild/LoRADS_v_2_0_1-alpha")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF),
    reason="reference binary not built (run: sh tools/build_reference.sh)")

_FIELDS = {
    "pobj": r"1\.Primal Objective:\s*:\s*([-\d.eE+]+)",
    "dobj": r"2\.Dual Objective:\s*:\s*([-\d.eE+]+)",
    "pinf_l1": r"1\.Constraint Violation\(1\)\s*:\s*([-\d.eE+]+)",
    "dinf_l1": r"2\.Dual Infeasibility\(1\)\s*:\s*([-\d.eE+]+)",
    "gap": r"3\.Primal Dual Gap\s*:\s*([-\d.eE+]+)",
    "pinf_inf": r"5\.Constraint Violation\(Inf\)\s*:\s*([-\d.eE+]+)",
    "dinf_inf": r"6\.Dual Infeasibility\(Inf\)\s*:\s*([-\d.eE+]+)",
}


def _run_ref(path, *flags):
    out = subprocess.run([REF, path, *flags], capture_output=True,
                         text=True, timeout=600).stdout
    res = {}
    for k, pat in _FIELDS.items():
        m = re.search(pat, out)
        assert m, f"reference output missing {k}:\n{out[-2000:]}"
        res[k] = float(m.group(1))
    return res


def _assert_dimacs_parity(res, ref, tol=1e-5):
    """Both solvers satisfy the reference's OPTIMAL bands
    (main.c:478-487), and objectives agree."""
    assert res.pobj == pytest.approx(ref["pobj"], rel=1e-3, abs=1e-3)
    for v, name in ((ref["pinf_l1"], "ref pinf"),
                    (res.pinf_l1, "our pinf")):
        assert v <= tol, f"{name} = {v}"
    for v, name in ((ref["dinf_l1"], "ref dinf"),
                    (res.dinf_l1, "our dinf"),
                    (ref["gap"], "ref gap"), (res.gap, "our gap")):
        assert v <= 5 * tol, f"{name} = {v}"
    # the Inf-norm columns have no acceptance band in the reference's
    # classifier; assert they were parsed/computed as finite numbers
    assert np.isfinite([ref["pinf_inf"], ref["dinf_inf"],
                        res.pinf_inf, res.dinf_inf]).all()


@pytest.mark.parametrize("make", [
    lambda: generators.maxcut(n=300, avg_degree=6, seed=11),
    lambda: generators.random_multiblock(n_blocks=3, dim=15, m=12,
                                         seed=13),
])
def test_dimacs_matches_reference(tmp_path, make):
    problem = make()
    f = str(tmp_path / "p.dat-s")
    write_sdpa(f, problem)
    ref = _run_ref(f)
    res = LoradsSolver(problem, LoradsParams(verbose=False)).solve()
    _assert_dimacs_parity(res, ref)


def test_readme_profile_22_blocks(tmp_path):
    """README.md:52-111's worked example is a 22-block instance; this
    is the same block-count profile at test scale (22 blocks, shared
    constraints), both solvers to full DIMACS bands."""
    problem = generators.random_multiblock(n_blocks=22, dim=12, m=40,
                                           density=0.3, seed=21)
    f = str(tmp_path / "p22.dat-s")
    write_sdpa(f, problem)
    ref = _run_ref(f)
    res = LoradsSolver(problem, LoradsParams(verbose=False)).solve()
    _assert_dimacs_parity(res, ref)


def test_pure_reference_semantics(tmp_path):
    """Auto defaults pinned to the reference's fixed values and the
    dual-repair extension off: the solve keeps exact reference
    semantics (config.py structure-based defaults disengage when the
    fields are set explicitly)."""
    problem = generators.maxcut(n=300, avg_degree=6, seed=11)
    f = str(tmp_path / "p.dat-s")
    write_sdpa(f, problem)
    ref = _run_ref(f)
    params = LoradsParams(verbose=False, dual_repair=False,
                          times_log_rank=2.0, alm_rho_factor=2.0,
                          lbfgs_list_length=2)
    res = LoradsSolver(problem, params).solve()
    _assert_dimacs_parity(res, ref)
