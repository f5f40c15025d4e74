"""Fine-grained phase timing for the theta family on the ambient
backend (ALM / ADMM / certificate / spectral repair / tail) — the
round-4 theta300 repair-cost harness (VERDICT r3 #5)."""
import time, sys
import jax
from lorads_tpu import LoradsParams
from lorads_tpu.io import generators
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.alg import spectral_repair as sr

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
problem = generators.lovasz_theta(n=n, avg_degree=8, seed=5)
params = LoradsParams(verbose=False, time_sec_limit=1e9, reopt_level=2,
                      dtype="auto")

for tag in ("WARM", "STEADY"):
    t0 = time.time()
    s = LoradsSolver(problem, params)
    t_init = time.time() - t0

    marks = {}
    def timing(cls_or_mod, name, key):
        orig = getattr(cls_or_mod, name)
        def wrapped(*a, **k):
            t = time.time(); out = orig(*a, **k)
            marks[key] = marks.get(key, 0.0) + time.time() - t
            marks[key + "_n"] = marks.get(key + "_n", 0) + 1
            return out
        setattr(cls_or_mod, name, wrapped)
        return orig

    o1 = timing(LoradsSolver, "dual_infeasibility", "cert")
    o2 = timing(LoradsSolver, "admm_phase", "admm")
    o3 = timing(LoradsSolver, "alm_phase", "alm")
    o4 = timing(sr, "try_spectral_repair", "repair")
    o5 = timing(LoradsSolver, "_dual_infeas_pass", "cert_pass")

    t0 = time.time()
    res = s.solve()
    total = time.time() - t0
    LoradsSolver.dual_infeasibility = o1
    LoradsSolver.admm_phase = o2
    LoradsSolver.alm_phase = o3
    sr.try_spectral_repair = o4
    LoradsSolver._dual_infeas_pass = o5
    # repair contains cert passes; subtract nested double counting note
    tracked = marks.get('alm',0)+marks.get('admm',0)+marks.get('cert',0)+marks.get('repair',0)
    print(f"{tag}: init={t_init:.2f} alm={marks.get('alm',0):.2f} "
          f"admm={marks.get('admm',0):.2f} cert={marks.get('cert',0):.2f} "
          f"repair={marks.get('repair',0):.2f} "
          f"(cert_pass={marks.get('cert_pass',0):.2f} x{marks.get('cert_pass_n',0)}) "
          f"other={total-tracked:.2f} total={total:.2f} "
          f"status={res.status.value} pinf={res.pinf_l1:.1e} "
          f"gap={res.gap:.1e} dinf={res.dinf_l1:.1e}", flush=True)
