"""Optional head-to-head parity with the reference C binary.

Runs only when a built reference binary exists (see
tools/compare_reference.py; build: cmake /root/reference + make).
Asserts both solvers reach the same objective within DIMACS bands.
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
    not os.path.exists(REF), reason="reference binary not built")


def _run_ref(path):
    out = subprocess.run([REF, path], capture_output=True, text=True,
                         timeout=300).stdout
    m = re.search(r"1\.Primal Objective:\s*:\s*([-\d.e+]+)", out)
    return float(m.group(1))


@pytest.mark.parametrize("make", [
    lambda: generators.maxcut(n=300, avg_degree=6, seed=11),
    lambda: generators.random_multiblock(n_blocks=3, dim=15, m=12,
                                         seed=13),
])
def test_objective_matches_reference(tmp_path, make):
    problem = make()
    f = str(tmp_path / "p.dat-s")
    write_sdpa(f, problem)
    ref_pobj = _run_ref(f)
    res = LoradsSolver(problem, LoradsParams(verbose=False)).solve()
    assert res.pobj == pytest.approx(ref_pobj, rel=1e-3, abs=1e-3)
    assert res.pinf_l1 <= 1e-5
