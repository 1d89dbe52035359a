#!/bin/bash
# Round-5 follow-up TPU queue (run after round5_queue.sh completes), in
# value order so an early cutoff still leaves the important measurements:
#  5. full-scale end-to-end refresh (measures the pipelined I/O + effects
#     breakdown at native 800x800/30k scale — VERDICT items 3+4)
#  6. driver-bench sanity line
#  7. extend both attribution-ablation cells to 24 alive seeds
#  8. final aggregation with every arm at full strength
set -x
cd /root/repo
PYTHONUNBUFFERED=1 python examples/full_scale.py \
  --report examples/full_scale_report_v5e.json
python bench.py
P="python examples/parity_study.py --iters 5000"
$P --arms framework_paired_hier_f32p --abl-seeds 24 \
  --out examples/parity_report_phase5a.json
$P --arms framework_paired_hier_xla32 --abl-seeds 24 \
  --out examples/parity_report_phase5b.json
$P --arms all --seeds 24 --hier-seeds 24 --abl-seeds 24 --f32-seeds 4 \
  --out examples/parity_report.json
echo "ROUND5 QUEUE2 DONE"
