#!/bin/bash
# Round-3 chip backlog, part 3: everything remaining, under the fixed
# timing methodology (scan escalation to k=10240; XLA small-N via scans;
# device-resident u32 inputs) and the fixed engines (2^17-row recursion,
# staged u32 route).  Strictly serialized.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/chiplog
mkdir -p "$LOG"

step() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$@" > "$LOG/r3_$name.out" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

# batch-1 merge table, reference scope (fwd 12-24, inv 10-24)
step batch1_merge 14400 python benchmarks/sweep.py --engine merge \
  --dtypes u64 --batch 1 \
  --sizes 10,11,12,13,14,15,16,17,18,19,20,21,22,23,24

# headline with noise bound + polymul cell
step bench_headline 3600 python bench.py

# compiled non-default routes incl the new shard_map seam
step drive_compiled 3600 python benchmarks/drive_compiled.py

# re-drives with fixed code
step merge26     3600 python benchmarks/bigring_perf.py merge26
step u32m24      3600 python benchmarks/bigring_perf.py u32m24
step u32m25b     3600 python benchmarks/bigring_perf.py u32m25
step polymul24   3600 python benchmarks/bigring_perf.py polymul24
step fourstep24b 3600 python benchmarks/bigring_perf.py fourstep24

# batch-1 4-step table (reference scope logn 12-24)
step batch1_4step 14400 python benchmarks/sweep.py --engine 4step \
  --dtypes u64 --batch 1 --sizes 12,13,14,15,16,17,18,19,20,21,22,23,24
