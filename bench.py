"""Benchmark driver: Max-Cut G-set-style time-to-tolerance.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference C LoRADS solves its README
worked example (m=2964) in 9.84 s on an unspecified CPU; the repo
publishes no G-set numbers.  As the closest reproducible anchor we use
the reference solver's own algorithmic profile: time to reach
phase2Tol-level DIMACS errors (pinf <= 1e-5, gap <= 5e-5) on a
G-set-like Max-Cut instance (n=2000, avg degree 6).  vs_baseline is
measured solve wall-clock over a 10 s nominal reference budget for an
instance of this size class (README.md:109 scale anchor).
"""

import json
import os
import sys
import time

BASELINE_SECONDS = 10.0  # reference wall-clock anchor (BASELINE.md)


def main():
    n = int(os.environ.get("BENCH_N", "2000"))
    from lorads_tpu.io import generators
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    problem = generators.maxcut(n=n, avg_degree=6, seed=7)
    params = LoradsParams(verbose=False, time_sec_limit=600.0,
                          reopt_level=2)
    solver = LoradsSolver(problem, params)

    # warm the jit caches on the tiny shapes first is not possible
    # (shapes differ); measure end-to-end including compile, then a
    # second solve to report steady-state algorithm time.
    t0 = time.time()
    res = solver.solve()
    total_with_compile = time.time() - t0

    solver2 = LoradsSolver(problem, params)
    t0 = time.time()
    res = solver2.solve()
    solve_seconds = time.time() - t0

    ok = (res.pinf_l1 <= params.phase2_tol
          and res.gap <= 5 * params.phase2_tol)
    out = {
        "metric": f"maxcut_n{n}_time_to_1e-5",
        "value": round(solve_seconds, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / max(solve_seconds, 1e-9),
                             3),
        "converged": bool(ok),
        "status": res.status.value,
        "pinf_l1": res.pinf_l1,
        "gap": res.gap,
        "dinf_l1": res.dinf_l1,
        "compile_overhead_s": round(total_with_compile - solve_seconds, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
