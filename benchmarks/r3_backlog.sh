#!/bin/bash
# Round-3 chip backlog: every remaining chip drive, strictly serialized
# (never two TPU processes — they contend through the relay).  Each step
# logs to benchmarks/chiplog/ and a failure/timeout moves on to the next.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/chiplog
mkdir -p "$LOG"

step() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$@" > "$LOG/r3_$name.out" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

# 1. big-N cells (merge24 already PASS, r3_merge24.out)
for cell in merge25 merge26 merge27 merge28 u32m24 u32m25 fourstep24; do
  step "$cell" 3600 python benchmarks/bigring_perf.py "$cell"
done

# 2. batch-1 merge table, reference scope (fwd 12-24, inv 10-24; we run
#    10-24 both directions) — VERDICT r2 item 2
step batch1_merge 10800 python benchmarks/sweep.py --engine merge \
  --dtypes u64 --batch 1 \
  --sizes 10,11,12,13,14,15,16,17,18,19,20,21,22,23,24

# 3. headline with noise bound + polymul cell — VERDICT r2 items 3/6
step bench_headline 3600 python bench.py

# 4. compiled non-default routes incl the new shard_map seam — item 7
step drive_compiled 3600 python benchmarks/drive_compiled.py

# 5. batch-1 4-step table (reference scope logn 12-24)
step batch1_4step 10800 python benchmarks/sweep.py --engine 4step \
  --dtypes u64 --batch 1 --sizes 12,13,14,15,16,17,18,19,20,21,22,23,24
