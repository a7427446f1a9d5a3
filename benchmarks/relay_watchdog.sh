#!/bin/bash
# Probe the TPU relay every ~15 min; the moment device enumeration
# answers, run the round-2 chip backlog (benchmarks/chip_backlog.sh).
# Gives up after MAX_PROBES probes so the session is re-invoked with a
# definitive "still wedged" answer rather than hanging forever.
set -u
cd "$(dirname "$0")/.."
MAX_PROBES=${1:-40}
for ((i = 1; i <= MAX_PROBES; i++)); do
    echo "=== probe $i/$MAX_PROBES at $(date +%H:%M:%S)"
    if timeout 240 python -c "import jax; assert jax.default_backend() != 'cpu', 'fell back to CPU'; print(jax.devices())"; then
        echo "=== relay is back — running the backlog"
        bash benchmarks/chip_backlog.sh
        exit $?
    fi
    sleep 880
done
echo "=== relay still wedged after $MAX_PROBES probes"
exit 2
