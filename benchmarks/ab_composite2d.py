"""Same-day A/B: (TR,1,S) lane-layout composite vs dense (TR,S) 2D composite
in the single-pass train kernel (cfg.fused_composite2d) — the "batch rays'
composites into wider lane groups" idea from BENCH_NOTES round 3's roofline.

Run on the real TPU:  python benchmarks/ab_composite2d.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_train_step  # noqa: E402


def main():
    from danerf_tpu.config import NeRFConfig

    results = {}
    for hier in (False, True):
        for c2d in (False, True):
            cfg = NeRFConfig(num_importance=64 if hier else 0,
                             use_pallas=True, use_bf16=True,
                             fused_composite2d=c2d)
            key = f"{'hier' if hier else 'coarse'}_{'2d' if c2d else 'lane'}"
            reps = [bench_train_step(cfg) for _ in range(3)]
            results[key] = max(reps)
            print(f"{key}: {max(reps):,.0f} rays/s  (reps "
                  f"{[f'{r:,.0f}' for r in reps]})", flush=True)

    for mode in ("coarse", "hier"):
        a, b = results[f"{mode}_lane"], results[f"{mode}_2d"]
        print(f"{mode}: 2d/lane = {b / a:.3f} ({(b / a - 1) * 100:+.1f}%)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
