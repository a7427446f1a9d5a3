#!/bin/bash
# Round-3 chip backlog, part 5: batch-1 merge 18-21 under the
# noise-escalating unrolled marginal (time_marginal_spread now
# escalates averaging depth 4x to the 25% noise target, like the scan
# path), with full error capture for the logn-18 compile crash.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/chiplog
mkdir -p "$LOG"

step() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$@" > "$LOG/r3_$name.out" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

step batch1_merge_fix2 10800 python benchmarks/sweep.py --engine merge \
  --dtypes u64 --batch 1 --sizes 18,19,20,21

# transient relay failure during the batch-1 4-step drive (response
# body closed mid-compile) — re-drive the cell
step batch1_4step_fix 7200 python benchmarks/sweep.py --engine 4step \
  --dtypes u64 --batch 1 --sizes 14
