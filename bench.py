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
import time

# Reference C LoRADS wall-clock measured on this machine (BASELINE.md,
# "Measured on this machine"): maxcut n=2000 deg6 -> 0.367 s total,
# n=20000 deg8 -> 28.12 s total.
BASELINES = {2000: 0.367, 20000: 28.12}


def main():
    n = int(os.environ.get("BENCH_N", "20000"))
    deg = 8 if n >= 20000 else 6
    from lorads_tpu.io import generators
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    problem = generators.maxcut(n=n, avg_degree=deg, seed=7)
    # auto: f32 on TPU with f64 escalation if the noise floor blocks
    # the tolerance (maxcut converges fully at f32)
    params = LoradsParams(verbose=False, time_sec_limit=600.0,
                          reopt_level=2, dtype="auto")

    # Warm-up solve: compiles every phase graph.  Remote-compile
    # latency counts against the solver's time limit, so lift it here
    # or the warm-up aborts mid-phase and leaves later graphs cold.
    import dataclasses
    warm_params = dataclasses.replace(params, time_sec_limit=1e9)
    solver = LoradsSolver(problem, warm_params)
    t0 = time.time()
    res = solver.solve()
    total_with_compile = time.time() - t0

    solver2 = LoradsSolver(problem, params)
    t0 = time.time()
    res = solver2.solve()
    solve_seconds = time.time() - t0

    ok = (res.pinf_l1 <= params.phase2_tol
          and res.gap <= 5 * params.phase2_tol)
    base = BASELINES.get(n, 0.367 * n / 2000.0)
    out = {
        "metric": f"maxcut_n{n}_time_to_1e-5",
        "value": round(solve_seconds, 3),
        "unit": "s",
        "vs_baseline": round(base / max(solve_seconds, 1e-9), 3),
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
