"""Same-process A/B: two-kernel hierarchical path vs the fully-fused
one-kernel hierarchical train step (use_hier_onepass), plus the coarse-only
headline for the cost ratio.  Run on the real TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

from bench import bench_train_step  # noqa: E402
from danerf_tpu.config import NeRFConfig  # noqa: E402


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    coarse = NeRFConfig(num_importance=0, use_bf16=True, use_pallas=True)
    two = NeRFConfig(use_bf16=True, use_pallas=True, use_hier_onepass=False)
    one = NeRFConfig(use_bf16=True, use_pallas=True, use_hier_onepass=True)

    results = {}
    for name, cfg, iters in [("hier_onepass", one, 10),
                             ("hier_twokernel", two, 10),
                             ("coarse", coarse, 20)]:
        t0 = time.perf_counter()
        r = bench_train_step(cfg, warmup=2, iters=iters, steps_per_call=10)
        results[name] = r
        print(f"{name}: {r:,.0f} rays/s  (wall {time.perf_counter()-t0:.0f}s"
              " incl. compile)", file=sys.stderr)

    c = results["coarse"]
    print(f"cost vs coarse: onepass {c/results['hier_onepass']:.2f}x, "
          f"twokernel {c/results['hier_twokernel']:.2f}x", file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
