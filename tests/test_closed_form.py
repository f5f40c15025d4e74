"""End-to-end validation against analytically known SDP optima.

The reference establishes quality only via self-reported DIMACS errors
(SURVEY.md §4); these tests are stronger: the solver's primal objective
is compared against closed-form optimal values.

Ground truths:

* Lovász theta: theta(C5) = sqrt(5) (Lovász 1979); theta(Petersen) = 4
  (Kneser graph K(5,2): theta = (n·(-lam_min))/(lam_max - lam_min) for
  vertex-transitive graphs = 10·1/(3+1)·... = 4); theta(K_n) = 1;
  theta(empty_n) = n.
* Max-Cut SDP relaxation of the unit-weight cycle C_n:
  value = (n/2)(1 + cos(pi/n)) for odd n (optimal vectors equally
  spaced, adjacent angle pi(n-1)/n), and = n exactly for even n
  (bipartite: the integral cut of all edges is SDP-optimal).

Our formulations minimize, so pobj = -value.
"""

import math

import numpy as np
import pytest

from lorads_tpu import LoradsParams
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.io import generators


def _write_graph(tmp_path, name, n, edges):
    p = tmp_path / name
    lines = [f"{n} {len(edges)}"]
    lines += [f"{i + 1} {j + 1} 1" for i, j in edges]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _cycle(n):
    return [(i, (i + 1) % n) for i in range(n)]


def _petersen():
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, 5 + i) for i in range(5)]
    return outer + inner + spokes


def _complete(n):
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def _solve_pobj(path, builder, **kw):
    kw.setdefault("verbose", False)
    kw.setdefault("time_sec_limit", 300.0)
    problem = builder(path)
    res = LoradsSolver(problem, LoradsParams(**kw)).solve()
    assert res.pinf_l1 <= 1e-4, f"pinf {res.pinf_l1}"
    return float(res.pobj)


def test_theta_c5_is_sqrt5(tmp_path):
    path = _write_graph(tmp_path, "c5", 5, _cycle(5))
    pobj = _solve_pobj(path, generators.theta_from_graph)
    assert pobj == pytest.approx(-math.sqrt(5.0), abs=2e-3)


def test_theta_petersen_is_4(tmp_path):
    path = _write_graph(tmp_path, "petersen", 10, _petersen())
    pobj = _solve_pobj(path, generators.theta_from_graph)
    assert pobj == pytest.approx(-4.0, abs=4e-3)


def test_theta_complete_graph_is_1(tmp_path):
    path = _write_graph(tmp_path, "k6", 6, _complete(6))
    pobj = _solve_pobj(path, generators.theta_from_graph)
    assert pobj == pytest.approx(-1.0, abs=2e-3)


def test_maxcut_odd_cycle_closed_form(tmp_path):
    # C5: the canonical worst-case SDP/integral gap instance
    n = 5
    path = _write_graph(tmp_path, "c5", n, _cycle(n))
    pobj = _solve_pobj(path, generators.maxcut_from_graph)
    want = (n / 2.0) * (1.0 + math.cos(math.pi / n))
    assert pobj == pytest.approx(-want, abs=2e-3)


def test_maxcut_even_cycle_is_exact(tmp_path):
    # bipartite: the SDP relaxation is tight, value = |E| = n
    n = 8
    path = _write_graph(tmp_path, "c8", n, _cycle(n))
    pobj = _solve_pobj(path, generators.maxcut_from_graph)
    assert pobj == pytest.approx(-float(n), abs=2e-3)


def test_theta_sandwich_on_random_graph(tmp_path):
    # alpha(G) <= theta(G) <= chi_bar(G) (Lovász sandwich theorem) on a
    # small random graph with brute-forced alpha and clique cover.
    rng = np.random.default_rng(5)
    n = 9
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if rng.random() < 0.45]
    if not edges:  # pragma: no cover - seed guard
        edges = [(0, 1)]
    path = _write_graph(tmp_path, "rand9", n, edges)
    pobj = _solve_pobj(path, generators.theta_from_graph)
    theta = -pobj

    adj = np.zeros((n, n), dtype=bool)
    for i, j in edges:
        adj[i, j] = adj[j, i] = True
    # brute-force max independent set
    alpha = 0
    for mask in range(1 << n):
        members = [i for i in range(n) if mask >> i & 1]
        if len(members) <= alpha:
            continue
        if all(not adj[a, b] for ai, a in enumerate(members)
               for b in members[ai + 1:]):
            alpha = len(members)
    assert alpha - 5e-3 <= theta <= n + 5e-3
    # theta >= alpha with some slack; upper bound via trivial n
    assert theta >= alpha - 5e-3
