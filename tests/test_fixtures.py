"""Committed real-format fixture files (VERDICT r2 #6).

These files live in tests/fixtures/ and were NOT written by this repo's
canonical writer: hand_multiblock.dat-s is hand-authored with the
reference reader's edge cases (lorads_file_io.c:21-417), and the
generated-once files are shuffled/commented/upper-triangled by
tools/make_fixtures.py so the reader is exercised on foreign files.
"""

import math
import os

import numpy as np
import pytest

from lorads_tpu.io import generators
from lorads_tpu.io.sdpa import _read_sdpa_python, read_sdpa

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
DATS = ["hand_multiblock.dat-s", "mc_gtoy60.dat-s",
        "theta_gtoy60.dat-s"]


def fix(name):
    return os.path.join(FIXDIR, name)


def _assert_problems_equal(p1, p2):
    assert p1.m == p2.m
    np.testing.assert_array_equal(p1.rhs, p2.rhs)
    assert len(p1.blocks) == len(p2.blocks)
    for a, b in zip(p1.blocks, p2.blocks):
        assert a.dim == b.dim
        for f in ("obj_row", "obj_col", "obj_val", "a_con", "a_row",
                  "a_col", "a_val"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    assert (p1.lp is None) == (p2.lp is None)
    if p1.lp is not None:
        np.testing.assert_array_equal(p1.lp.obj, p2.lp.obj)
        for f in ("a_con", "a_col", "a_val"):
            np.testing.assert_array_equal(getattr(p1.lp, f),
                                          getattr(p2.lp, f))


@pytest.mark.parametrize("name", DATS)
def test_both_readers_identical_on_fixture(name):
    """Native C++ and pure-Python readers parse each committed fixture
    to bit-identical problems (lorads_file_io.c parity surface)."""
    from lorads_tpu import native as native_mod

    p_py = _read_sdpa_python(fix(name))
    if native_mod.load() is None:
        pytest.skip("native toolchain unavailable")
    p_nat = read_sdpa(fix(name), native=True)
    _assert_problems_equal(p_nat, p_py)


def test_hand_multiblock_golden():
    """Golden parse of the hand-authored fixture: braced dims, comment
    styles, objective negation, upper-tri normalization, duplicate
    summing, 1e-12 drop, LP block."""
    prob = read_sdpa(fix("hand_multiblock.dat-s"))
    assert prob.m == 3
    assert [b.dim for b in prob.blocks] == [2, 3]
    assert prob.n_lp_cols == 2
    np.testing.assert_allclose(prob.rhs, [1.0, 2.0, 1.5])

    C1 = prob.blocks[0].dense_obj()
    np.testing.assert_allclose(C1, [[2.0, -1.0], [-1.0, 0.0]])
    C2 = prob.blocks[1].dense_obj()
    expect = np.zeros((3, 3))
    expect[0, 0], expect[1, 1] = 1.0, 0.5
    expect[2, 0] = expect[0, 2] = -0.25
    np.testing.assert_allclose(C2, expect)
    np.testing.assert_allclose(prob.lp.obj, [0.5, 1.0])

    # duplicate 0.5 + 0.5 summed on A1[0,0]
    A1 = prob.blocks[0].dense_constr(0)
    np.testing.assert_allclose(A1, np.eye(2))
    # the 1e-13 entry on block 1 / constraint 2 is dropped
    assert not np.any(prob.blocks[0].a_con == 1)
    A2 = prob.blocks[1].dense_constr(1)
    np.testing.assert_allclose(A2, np.eye(3))
    np.testing.assert_allclose(prob.lp.dense_matrix()[2], [1.0, 2.0])


def test_hand_multiblock_solves_to_analytic_optimum():
    """min over the fixture = lam_min(C1) + 2 lam_min(C2) + LP part
    (each trace-constrained block's optimum is its min eigenvalue)."""
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    prob = read_sdpa(fix("hand_multiblock.dat-s"))
    res = LoradsSolver(prob, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5
    expected = ((1.0 - math.sqrt(2.0))            # lam_min(C1), tr=1
                + 2.0 * (1.0 - math.sqrt(1.25)) / 2.0   # 2 lam_min(C2)
                + 0.75)                           # LP: x=(1.5, 0)
    assert res.pobj == pytest.approx(expected, abs=5e-4)


def test_mc_fixture_matches_graph_builder():
    """mc_gtoy60.dat-s parses to exactly the problem maxcut_from_graph
    builds from the committed rudy graph (the .dat-s is a shuffled,
    upper-triangled re-encoding of it)."""
    p_file = read_sdpa(fix("mc_gtoy60.dat-s"))
    p_graph = generators.maxcut_from_graph(fix("g_toy60.rudy"))
    _assert_problems_equal(p_file, p_graph)


@pytest.mark.parametrize("name", ["mc_gtoy60.dat-s",
                                  "theta_gtoy60.dat-s"])
def test_fixture_solves(name):
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    prob = read_sdpa(fix(name))
    res = LoradsSolver(prob, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5 and res.gap <= 5e-5


def test_cli_reads_fixture(capsys):
    from lorads_tpu.__main__ import main

    assert main([fix("hand_multiblock.dat-s"), "--quiet"]) == 0
    out = capsys.readouterr().out
    assert "optimal" in out


@pytest.mark.parametrize("name,m,nblk", [
    ("maxcut2000.dat-s", 2000, 1),
    ("theta300.dat-s", 1201, 1),
    ("matcomp500.dat-s", 29933, 1),
])
def test_bench_fixture_integrity(name, m, nblk):
    """The vendored mid-size bench fixtures (VERDICT r3 #7) parse
    through the production reader with the expected shapes — they are
    the instances bench.py's maxcut2000/theta300/matcomp500 families
    solve and the reference binary's baseline inputs (BASELINE.md
    round-4 table)."""
    prob = read_sdpa(fix(name))
    assert prob.m == m
    assert prob.n_sdp_blocks == nblk
