"""Head-to-head: lorads_tpu vs the reference C binary on one machine.

Generates the benchmark families (SURVEY.md §6: Max-Cut G-set style,
Lovász theta, matrix completion), writes .dat-s files, runs both
solvers, and prints a wall-clock/DIMACS table.

Usage:
  python tools/compare_reference.py --ref /tmp/refbuild/LoRADS_v_2_0_1-alpha
  python tools/compare_reference.py --suite small --dtype f32
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import tempfile
import time


SUITES = {
    "small": [
        ("maxcut_n2000", dict(kind="maxcut", n=2000, avg_degree=6)),
        ("theta_n800", dict(kind="theta", n=800, avg_degree=16)),
        ("matcomp_500x500", dict(kind="matcomp", n1=500, n2=500,
                                 true_rank=5, frac_obs=0.08)),
    ],
    "large": [
        ("maxcut_n20000", dict(kind="maxcut", n=20000, avg_degree=8)),
        ("maxcut_n50000", dict(kind="maxcut", n=50000, avg_degree=10)),
        ("matcomp_2000x2000", dict(kind="matcomp", n1=2000, n2=2000,
                                   true_rank=8, frac_obs=0.02)),
    ],
}


def gen_problem(spec):
    from lorads_tpu.io import generators

    kind = spec.pop("kind")
    if kind == "maxcut":
        return generators.maxcut(seed=7, **spec)
    if kind == "theta":
        return generators.lovasz_theta(seed=7, **spec)
    if kind == "matcomp":
        return generators.matrix_completion(seed=7, **spec)
    raise ValueError(kind)


def run_ref(binary, path, timeout):
    t0 = time.time()
    try:
        out = subprocess.run([binary, path], capture_output=True,
                             text=True, timeout=timeout).stdout
    except subprocess.TimeoutExpired:
        return dict(time=float("inf"), status="timeout")
    wall = time.time() - t0

    def grab(pat):
        m = re.search(pat + r"\s*:\s*([-\d.e+]+)", out)
        return float(m.group(1)) if m else float("nan")

    return dict(
        time=wall,
        pobj=grab(r"1\.Primal Objective:\s*"),
        pinf=grab(r"1\.Constraint Violation\(1\)\s*"),
        dinf=grab(r"2\.Dual Infeasibility\(1\)\s*"),
        gap=grab(r"3\.Primal Dual Gap\s*"),
    )


def run_ours(problem, dtype, timeout):
    from lorads_tpu import LoradsParams
    from lorads_tpu.alg.solver import LoradsSolver

    params = LoradsParams(verbose=False, time_sec_limit=timeout,
                          dtype=dtype)
    # compile warm-up + measured run
    t0 = time.time()
    res = LoradsSolver(problem, params).solve()
    first = time.time() - t0
    t0 = time.time()
    res = LoradsSolver(problem, params).solve()
    steady = time.time() - t0
    return dict(time=steady, time_with_compile=first, pobj=res.pobj,
                pinf=res.pinf_l1, dinf=res.dinf_l1, gap=res.gap,
                status=res.status.value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/LoRADS_v_2_0_1-alpha")
    ap.add_argument("--suite", default="small", choices=list(SUITES))
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    from lorads_tpu.io.sdpa import write_sdpa

    rows = []
    for name, spec in SUITES[args.suite]:
        problem = gen_problem(dict(spec))
        ours = run_ours(problem, args.dtype, args.timeout)
        ref = None
        if not args.skip_ref and os.path.exists(args.ref):
            with tempfile.NamedTemporaryFile(
                    suffix=".dat-s", delete=False) as f:
                path = f.name
            write_sdpa(path, problem)
            ref = run_ref(args.ref, path, args.timeout)
            os.unlink(path)
        row = dict(name=name, ours=ours, ref=ref)
        rows.append(row)
        print(json.dumps(row))

    print("\n== summary ==")
    for row in rows:
        o, r = row["ours"], row["ref"]
        speed = (f"{r['time'] / o['time']:.2f}x"
                 if r and o["time"] > 0 else "n/a")
        print(f"{row['name']:>22}: ours {o['time']:8.2f}s "
              f"(pinf {o['pinf']:.1e} gap {o['gap']:.1e})  "
              f"ref {r['time'] if r else float('nan'):8.2f}s  "
              f"speedup {speed}")


if __name__ == "__main__":
    main()
