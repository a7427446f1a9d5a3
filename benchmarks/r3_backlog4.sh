#!/bin/bash
# Round-3 chip backlog, part 4: batch-1 merge cells 18-23 under the
# auto-scaled unrolled-marginal methodology (k=1/4, window >= 25 ms),
# replacing the clamped/noisy rows from the part-3 drive.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/chiplog
mkdir -p "$LOG"

step() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$@" > "$LOG/r3_$name.out" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

step batch1_merge_fix 14400 python benchmarks/sweep.py --engine merge \
  --dtypes u64 --batch 1 --sizes 18,19,20,21,22,23

# corrected RNS logn-17 route (large engine) compiled on chip
step rns17_fix 3600 python benchmarks/drive_compiled.py u64-rns-17

# quiet-box re-drives: earlier runs were concurrent with the CPU test
# suite and the eager-chain noise bounds ballooned (fourstep24 139%)
step fourstep24c 3600 python benchmarks/bigring_perf.py fourstep24
step merge26b    3600 python benchmarks/bigring_perf.py merge26

# batch-1 4-step table (reference scope logn 12-24) — backlog3 was cut
# off before this step ran
step batch1_4step 10800 python benchmarks/sweep.py --engine 4step \
  --dtypes u64 --batch 1 --sizes 12,13,14,15,16,17,18,19,20,21,22,23,24
