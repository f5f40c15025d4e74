"""Per-dispatch wall accounting for one solve: wraps the jitted entry
points (ALM outer chunks, ADMM chunks, certificate, init evals) and
prints each call's wall + iteration delta.  The small-instance
latency-floor harness (VERDICT r2 #4: maxcut2000 <= 0.25 s)."""
import os
import sys
import time

import jax

from lorads_tpu import LoradsParams
from lorads_tpu.alg import admm as admm_mod
from lorads_tpu.alg import alm as alm_mod
from lorads_tpu.alg import solver as sv
from lorads_tpu.io import generators


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "maxcut2000"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_problem
    problem = make_problem(name)
    params = LoradsParams(verbose=False, time_sec_limit=1e9,
                          reopt_level=2, dtype="auto")

    calls = []

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            # device-sync via a scalar fetch when possible
            leaves = [x for x in jax.tree.leaves(out)
                      if hasattr(x, "dtype")]
            if leaves:
                jax.device_get(leaves[0].ravel()[0] if leaves[0].ndim
                               else leaves[0])
            calls.append((name, time.time() - t0))
            return out
        return inner

    orig = {}
    orig["outer_chunk"] = alm_mod.outer_chunk
    alm_mod.outer_chunk = wrap("alm_outer_chunk", alm_mod.outer_chunk)
    orig["admm_init_eval"] = admm_mod.admm_init_eval
    admm_mod.admm_init_eval = wrap("admm_init_eval",
                                   admm_mod.admm_init_eval)
    orig["_dual_infeas_device"] = sv._dual_infeas_device
    sv._dual_infeas_device = wrap("dual_infeas", sv._dual_infeas_device)
    mk = admm_mod.make_admm_chunk

    def mk_wrapped(*a, **k):
        return wrap("admm_chunk", mk(*a, **k))
    admm_mod.make_admm_chunk = mk_wrapped

    for tag in ("WARM", "STEADY"):
        calls.clear()
        s = sv.LoradsSolver(problem, params)
        t0 = time.time()
        res = s.solve()
        total = time.time() - t0
        acc = {}
        for nm, dt in calls:
            c, w = acc.get(nm, (0, 0.0))
            acc[nm] = (c + 1, w + dt)
        print(f"{tag}: total={total:.3f} status={res.status.value} "
              f"pinf={res.pinf_l1:.1e} gap={res.gap:.1e} "
              f"dinf={res.dinf_l1:.1e}", flush=True)
        tracked = 0.0
        for nm, (c, w) in sorted(acc.items(), key=lambda kv: -kv[1][1]):
            print(f"  {nm:>18}: {c:3d} calls  {w:7.3f} s", flush=True)
            tracked += w
        print(f"  {'(untracked host)':>18}:            "
              f"{total - tracked:7.3f} s", flush=True)
        if tag == "STEADY":
            for nm, dt in calls:
                print(f"    {nm:>16} {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
