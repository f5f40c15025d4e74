"""SDPA reader/writer golden tests (reference: lorads_file_io.c)."""

import numpy as np
import pytest

from lorads_tpu.io import generators, read_sdpa, write_sdpa

TINY_SDPA = """\
* tiny example with one SDP block and one LP block
2
2
3 -2
1.0 2.0
0 1 1 1 2.0
0 1 1 2 -1.0
0 2 1 1 0.5
1 1 1 1 1.0
1 1 3 3 1.0
1 2 2 2 1.0
2 1 2 1 1.0
2 2 1 1 3.0
"""


@pytest.fixture
def tiny_file(tmp_path):
    p = tmp_path / "tiny.dat-s"
    p.write_text(TINY_SDPA)
    return str(p)


def test_read_tiny(tiny_file):
    prob = read_sdpa(tiny_file)
    assert prob.m == 2
    assert len(prob.blocks) == 1
    assert prob.blocks[0].dim == 3
    assert prob.n_lp_cols == 2
    np.testing.assert_allclose(prob.rhs, [1.0, 2.0])

    # objective negated on read (lorads_file_io.c:279-281)
    C = prob.blocks[0].dense_obj()
    expect = np.zeros((3, 3))
    expect[0, 0] = -2.0
    expect[0, 1] = expect[1, 0] = 1.0
    np.testing.assert_allclose(C, expect)

    A1 = prob.blocks[0].dense_constr(0)
    np.testing.assert_allclose(np.diag(A1), [1.0, 0.0, 1.0])
    A2 = prob.blocks[0].dense_constr(1)
    assert A2[0, 1] == 1.0 and A2[1, 0] == 1.0

    np.testing.assert_allclose(prob.lp.obj, [-0.5, 0.0])
    Alp = prob.lp.dense_matrix()
    np.testing.assert_allclose(Alp, [[0.0, 1.0], [3.0, 0.0]])


def test_tiny_entries_dropped(tmp_path):
    p = tmp_path / "drop.dat-s"
    p.write_text("1\n1\n2\n1.0\n0 1 1 1 1e-13\n1 1 1 1 1.0\n")
    prob = read_sdpa(str(p))
    assert prob.blocks[0].nnz_obj == 0


def test_roundtrip(tmp_path):
    prob = generators.random_multiblock(n_blocks=2, dim=6, m=5, n_lp=3,
                                        seed=3)
    path = tmp_path / "rt.dat-s"
    write_sdpa(str(path), prob)
    prob2 = read_sdpa(str(path))
    assert prob2.m == prob.m
    assert prob2.n_lp_cols == prob.n_lp_cols
    np.testing.assert_allclose(prob2.rhs, prob.rhs, rtol=1e-12)
    for b1, b2 in zip(prob.blocks, prob2.blocks):
        np.testing.assert_allclose(b2.dense_obj(), b1.dense_obj(),
                                   rtol=1e-12)
        for i in range(prob.m):
            np.testing.assert_allclose(b2.dense_constr(i),
                                       b1.dense_constr(i), rtol=1e-12)
    np.testing.assert_allclose(prob2.lp.dense_matrix(),
                               prob.lp.dense_matrix(), rtol=1e-12)
    np.testing.assert_allclose(prob2.lp.obj, prob.lp.obj, rtol=1e-12)


def test_duplicate_entries_summed(tmp_path):
    p = tmp_path / "dup.dat-s"
    p.write_text("1\n1\n2\n1.0\n1 1 1 2 1.0\n1 1 2 1 2.0\n")
    prob = read_sdpa(str(p))
    A = prob.blocks[0].dense_constr(0)
    assert A[1, 0] == 3.0


def test_native_reader_matches_python(tmp_path):
    """C++ tokenizer path produces bit-identical problems."""
    import numpy as np

    from lorads_tpu import native as native_mod
    from lorads_tpu.io import generators
    from lorads_tpu.io.sdpa import (_read_sdpa_python, read_sdpa,
                                    write_sdpa)

    if native_mod.load() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    f = str(tmp_path / "t.dat-s")
    problem = generators.random_multiblock(n_blocks=2, dim=15, m=9,
                                           n_lp=5, seed=11)
    write_sdpa(f, problem)
    p1 = read_sdpa(f, native=True)
    p2 = _read_sdpa_python(f)
    assert p1.m == p2.m
    np.testing.assert_array_equal(p1.rhs, p2.rhs)
    for a, b in zip(p1.blocks, p2.blocks):
        np.testing.assert_array_equal(a.obj_val, b.obj_val)
        np.testing.assert_array_equal(a.a_con, b.a_con)
        np.testing.assert_array_equal(a.a_row, b.a_row)
        np.testing.assert_array_equal(a.a_col, b.a_col)
        np.testing.assert_array_equal(a.a_val, b.a_val)
    np.testing.assert_array_equal(p1.lp.obj, p2.lp.obj)
    np.testing.assert_array_equal(p1.lp.a_val, p2.lp.a_val)


def test_cli_bad_input_friendly_error(tmp_path, capsys):
    from lorads_tpu.__main__ import main
    assert main([str(tmp_path / "missing.dat-s")]) == 2
    bad = tmp_path / "bad.dat-s"
    bad.write_text("garbage\nnot sdpa\n")
    assert main([str(bad)]) == 2
    err = capsys.readouterr().err
    assert "error:" in err


def test_gset_graph_reader(tmp_path):
    # rudy/G-set format: "n m" header + 1-based "i j w" edge lines
    from lorads_tpu.io import generators

    g = tmp_path / "toy.rudy"
    g.write_text("4 4\n1 2 1\n2 3 -1\n3 4 1\n1 4 1\n")
    n, a, b, w = generators.read_graph(str(g))
    assert n == 4 and a.size == 4
    assert list(w) == [1.0, -1.0, 1.0, 1.0]

    prob = generators.maxcut_from_graph(str(g))
    assert prob.m == 4 and prob.blocks[0].dim == 4
    # diagonal of C = -(signed degree)/4
    import numpy as np
    Cd = prob.blocks[0].dense_obj()
    np.testing.assert_allclose(np.diag(Cd), [-0.5, 0.0, 0.0, -0.5])

    th = generators.theta_from_graph(str(g))
    assert th.m == 5            # 4 edges + trace
    assert th.rhs[-1] == 1.0


def test_gset_maxcut_solves(tmp_path):
    import numpy as np
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver
    from lorads_tpu.io import generators

    rng = np.random.default_rng(3)
    n, ne = 120, 360
    a = rng.integers(0, n, ne)
    b = rng.integers(0, n, ne)
    keep = a != b
    lines = [f"{n} {keep.sum()}"] + [
        f"{i+1} {j+1} 1" for i, j in zip(a[keep], b[keep])]
    g = tmp_path / "rand.rudy"
    g.write_text("\n".join(lines) + "\n")
    prob = generators.maxcut_from_graph(str(g))
    res = LoradsSolver(prob, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5 and res.gap <= 5e-5


def test_cli_batched_instances(tmp_path, capsys):
    # several .dat-s files merge block-diagonally into one vectorized
    # batch solve; per-instance objectives must match solo solves
    import pytest
    from lorads_tpu import LoradsParams
    from lorads_tpu.__main__ import main
    from lorads_tpu.alg.solver import LoradsSolver
    from lorads_tpu.io import generators
    from lorads_tpu.io.sdpa import write_sdpa

    probs = [generators.maxcut(n=40, avg_degree=4, seed=2),
             generators.maxcut(n=36, avg_degree=4, seed=5)]
    paths = []
    for i, prob in enumerate(probs):
        f = tmp_path / f"mc{i}.dat-s"
        write_sdpa(str(f), prob)
        paths.append(str(f))

    assert main(paths + ["--quiet"]) == 0
    out = capsys.readouterr().out
    assert "merged 2 instances" in out
    assert "per-instance objectives" in out
    import re
    objs = [float(x) for x in
            re.findall(r"dat-s: +([-+\d.e]+)", out)]
    assert len(objs) == 2
    for prob, got in zip(probs, objs):
        res = LoradsSolver(prob, LoradsParams(verbose=False)).solve()
        assert got == pytest.approx(res.pobj, rel=1e-3, abs=1e-3)


def test_cli_end_to_end_flags(tmp_path, capsys):
    # full CLI wiring: every flag group exercised in-process, incl.
    # auto-default flags left unset, explicit reference values, dualUV,
    # and checkpoint save + resume
    from lorads_tpu.__main__ import main
    from lorads_tpu.io import generators
    from lorads_tpu.io.sdpa import write_sdpa

    f = tmp_path / "mc.dat-s"
    write_sdpa(str(f), generators.maxcut(n=40, avg_degree=4, seed=2))

    assert main([str(f), "--quiet", "--probInfo"]) == 0
    out = capsys.readouterr().out
    assert "primal_dual_optimal" in out and "Constraint Violation" in out
    # printfProbInfo-equivalent dump (lorads_solver.c:1173-1231)
    assert "Problem Information:" in out
    assert "Number of SDP Cones" in out and "Initial rank:" in out

    ck = tmp_path / "state.ckpt"
    sol = tmp_path / "sol.npz"
    assert main([str(f), "--quiet", "--timesLogRank", "2.0",
                 "--ALMRhoFactor", "2.0", "--lbfgsListLength", "2",
                 "--dualUV", "1", "--checkpoint", str(ck),
                 "--solOut", str(sol)]) == 0
    assert ck.exists() and sol.exists()
    assert main([str(f), "--quiet", "--resume", str(ck)]) == 0
    out = capsys.readouterr().out
    assert "resumed from" in out
    # warm start from the exported solution
    assert main([str(f), "--quiet", "--warmStart", str(sol)]) == 0
    out = capsys.readouterr().out
    assert "warm started from" in out
    assert "primal_dual_optimal" in out
    # corrupt warm-start input -> friendly error, exit 2
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert main([str(f), "--quiet", "--warmStart", str(bad)]) == 2


def test_gset_torus_generator_roundtrip(tmp_path):
    """G-set torus-class generator (VERDICT r4 #5): 2-D toroidal grid,
    4-regular, 2n +/-1 edges; rudy write/read round-trips and the
    Max-Cut SDP built from the file solves."""
    import os

    from lorads_tpu.io import generators as g

    n, a, b, w = g.gset_torus(6, 5, seed=3)
    assert n == 30 and a.size == 60
    assert set(np.unique(w)) <= {-1.0, 1.0}
    # 4-regular
    deg = np.zeros(n)
    np.add.at(deg, a, 1)
    np.add.at(deg, b, 1)
    assert np.all(deg == 4)
    path = os.path.join(tmp_path, "torus.rudy")
    g.write_graph(path, n, a, b, w)
    n2, a2, b2, w2 = g.read_graph(path)
    assert n2 == n
    np.testing.assert_array_equal(a2, a)
    np.testing.assert_array_equal(b2, b)
    np.testing.assert_allclose(w2, w)

    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    prob = g.maxcut_from_graph(path)
    res = LoradsSolver(prob, LoradsParams(verbose=False)).solve()
    assert res.pinf_l1 <= 1e-5
