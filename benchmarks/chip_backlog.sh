#!/bin/bash
# Round-2 on-chip measurement backlog — run the moment the relay
# recovers.  STRICTLY SEQUENTIAL (never two TPU processes, CLAUDE.md);
# each step under `timeout` so one wedged compile cannot eat the chip
# window.  Output accumulates in benchmarks/chip_backlog.out for
# transcription into RESULTS_r2.md.
#
#   bash benchmarks/chip_backlog.sh            # full backlog
#   bash benchmarks/chip_backlog.sh quick      # probe + drives only
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/chip_backlog.out
log() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$OUT"; }

log "device probe"
if ! timeout 300 python -c "import jax; assert jax.default_backend() != 'cpu', 'fell back to CPU'; print(jax.devices())" >> "$OUT" 2>&1; then
    log "relay still wedged — aborting"
    exit 1
fi

log "compiled-route drives (VERDICT item 3)"
timeout 2400 python benchmarks/drive_compiled.py 2>&1 | tee -a "$OUT"

if [ "${1:-full}" = quick ]; then exit 0; fi

log "verify-skill compiled examples"
for args in "16 4" "20 2"; do
    timeout 1200 python examples/example_merge_ntt.py $args 2>&1 | tail -2 | tee -a "$OUT"
done
timeout 1200 python examples/example_4step_ntt.py 17 2 2>&1 | tail -2 | tee -a "$OUT"
timeout 1200 python examples/example_rns_ntt.py 13 6 2>&1 | tail -2 | tee -a "$OUT"

log "headline variants (VERDICT item 2) — own process each"
for v in base nopow2; do
    timeout 1800 python benchmarks/r2_headline.py "$v" 2>&1 | tee -a "$OUT"
done
# nooff = the pre-OFF-fold kernel: r2_headline.py refuses to simulate
# it (the fold touches corr tables AND the accumulator cast); measure
# by checking out the pre-fold pallas_mxu.py, running 'base', and
# restoring — abort the step (not the backlog) if the tree is dirty
log "headline variant nooff (pre-fold kernel via git checkout)"
if git diff --quiet -- gpuntt_tpu/ops/pallas_mxu.py; then
    git checkout 43fd9c2 -- gpuntt_tpu/ops/pallas_mxu.py
    # the old file lacks kernel_consts/combine_mode; r2_headline only
    # loads the in-VMEM engine (pallas_mxu_large stays un-imported),
    # but smoke the import before burning chip time, and restore HEAD
    # no matter how the measurement exits
    if timeout 120 python -c "import gpuntt_tpu.ops.pallas_mxu"; then
        timeout 1800 python benchmarks/r2_headline.py base 2>&1 \
            | sed 's/"variant": "base"/"variant": "nooff"/' | tee -a "$OUT"
    else
        log "SKIP nooff: old kernel no longer imports against HEAD tree"
    fi
    git checkout HEAD -- gpuntt_tpu/ops/pallas_mxu.py
else
    log "SKIP nooff: pallas_mxu.py has uncommitted changes"
fi

log "bench.py headline"
timeout 1800 python bench.py 2>&1 | tee -a "$OUT"

log "batch-1 latency (reference nvbench scope, VERDICT item 4)"
timeout 5400 python benchmarks/sweep.py --engine merge --batch 1 \
    --sizes 12,14,16,18,20,22 --dtypes u64 2>&1 | tee -a "$OUT"

log "staged big-N route: merge 24+26 (VERDICT item 1) + 4-step 24 (item 8)"
timeout 3600 python benchmarks/sweep.py --engine merge --sizes 24 \
    --dtypes u64 --batch 1 2>&1 | tee -a "$OUT"
timeout 3600 python benchmarks/sweep.py --engine merge --sizes 26 \
    --dtypes u64 --batch 1 2>&1 | tee -a "$OUT"
timeout 3600 python benchmarks/sweep.py --engine 4step --sizes 24 \
    --dtypes u64 --batch 1 2>&1 | tee -a "$OUT"

log "PerCoefficient cell (VERDICT weak item 5)"
timeout 2400 python benchmarks/sweep.py --engine merge --layout coeff \
    --sizes 12,13,14 --dtypes u64 2>&1 | tee -a "$OUT"

log "backlog complete"
