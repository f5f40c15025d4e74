"""Checkpointing a long solve and resuming it in a new process.

Run:  python examples/checkpoint_and_resume.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lorads_tpu import LoradsParams
from lorads_tpu.alg.solver import LoradsSolver
from lorads_tpu.io import generators


def main():
    problem = generators.maxcut(n=300, avg_degree=6, seed=1)
    ckpt = tempfile.mktemp(suffix=".npz")

    # first session: solve with auto-checkpointing at phase boundaries
    params = LoradsParams(verbose=False, checkpoint_path=ckpt)
    s1 = LoradsSolver(problem, params)
    res1 = s1.solve()
    print(f"first solve: {res1.status.value} gap={res1.gap:.1e} "
          f"-> checkpoint {ckpt}")

    # second session: restore and continue (here: instant reconverge)
    s2 = LoradsSolver(problem, LoradsParams(verbose=False))
    meta = s2.load(ckpt)
    print(f"restored phase={meta['phase']} ranks={s2.ranks}")
    res2 = s2.solve()
    print(f"resumed solve: {res2.status.value} gap={res2.gap:.1e}")


if __name__ == "__main__":
    main()
