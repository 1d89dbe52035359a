#!/bin/bash
# Round-5 sequential TPU queue (single chip => strictly serialized).
# Phase 1: attribution-ablation cells for the +1.26 dB hier delta (VERDICT item 1)
# Phase 2: hier arms to 24 alive pairs (VERDICT item 2)
# Phase 3: coarse arms to 24 alive pairs
# Phase 4: full re-aggregation into examples/parity_report.json
set -x
cd /root/repo
P="python examples/parity_study.py --iters 5000"
$P --arms framework_paired_hier_f32p,framework_paired_hier_xla32 --abl-seeds 12 \
  --out examples/parity_report_phase1.json
$P --arms reference_hier,framework_paired_hier,framework_hier --hier-seeds 24 \
  --out examples/parity_report_phase2.json
$P --arms reference,framework_paired,framework --seeds 24 \
  --out examples/parity_report_phase3.json
$P --arms all --seeds 24 --hier-seeds 24 --abl-seeds 12 --f32-seeds 4 \
  --out examples/parity_report.json
echo "ROUND5 QUEUE DONE"
