"""Fine-grained phase timing for the matcomp family on the ambient
backend (ALM / escalate+ADMM / certificate / tail), the round-3
matcomp2000 optimization harness."""
import time, sys
import jax
from lorads_tpu import LoradsParams
from lorads_tpu.io import generators
from lorads_tpu.alg.solver import LoradsSolver

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
problem = generators.matrix_completion(n1=n, n2=n, true_rank=3,
                                       frac_obs=0.12, seed=3)
params = LoradsParams(verbose=False, time_sec_limit=1e9, reopt_level=2,
                      dtype="auto")

for tag in ("WARM", "STEADY"):
    t0 = time.time()
    s = LoradsSolver(problem, params)
    t_init = time.time() - t0

    import lorads_tpu.alg.solver as sv
    marks = {}
    orig_di = LoradsSolver.dual_infeasibility
    def di(self, stats=None, **k):
        t = time.time(); out = orig_di(self, stats, **k)
        marks.setdefault("cert", 0.0); marks["cert"] += time.time() - t
        return out
    LoradsSolver.dual_infeasibility = di
    orig_ap = LoradsSolver.admm_phase
    def ap(self, *a, **k):
        t = time.time(); out = orig_ap(self, *a, **k)
        marks.setdefault("admm", 0.0); marks["admm"] += time.time() - t
        return out
    LoradsSolver.admm_phase = ap
    orig_alm = LoradsSolver.alm_phase
    def alm(self, *a, **k):
        t = time.time(); out = orig_alm(self, *a, **k)
        marks.setdefault("alm", 0.0); marks["alm"] += time.time() - t
        return out
    LoradsSolver.alm_phase = alm

    t0 = time.time()
    res = s.solve()
    total = time.time() - t0
    LoradsSolver.dual_infeasibility = orig_di
    LoradsSolver.admm_phase = orig_ap
    LoradsSolver.alm_phase = orig_alm
    other = total - sum(marks.values())
    print(f"{tag}: init={t_init:.2f} alm={marks.get('alm',0):.2f} "
          f"admm={marks.get('admm',0):.2f} cert={marks.get('cert',0):.2f} "
          f"other={other:.2f} total={total:.2f} "
          f"status={res.status.value} pinf={res.pinf_l1:.1e} "
          f"gap={res.gap:.1e} dinf={res.dinf_l1:.1e}", flush=True)
