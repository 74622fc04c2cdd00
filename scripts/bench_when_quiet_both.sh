#!/bin/bash
# Variant of bench_when_quiet.sh that gates launch on BOTH ambient legs:
# the r16 end-of-round attempt launched on 3 sub-0.15 CPU probes and
# still drew a membw-degraded label (membw swung independently), so this
# launcher requires cpu < CPU_BAR AND membw < MEMBW_BAR for
# STREAK_NEEDED consecutive minutes. Bars default to the committed-best
# probes x ~1.2 (inside the record gate's 1.25 healthy threshold).
# Output -> scripts/bench_quiet_run.log; probes -> bench_quiet_probes.log.
cd /root/repo || exit 1
MAX_POLLS=${MAX_POLLS:-120}
STREAK_NEEDED=${STREAK_NEEDED:-3}
CPU_BAR=${CPU_BAR:-0.145}
MEMBW_BAR=${MEMBW_BAR:-0.056}
streak=0
: > scripts/bench_quiet_probes.log
for ((i = 1; i <= MAX_POLLS; i++)); do
    read -r cpu membw < <(python -c "
from bench import _ambient_calibration as c, _ambient_membw_calibration as m
print(c(), m())" 2>/dev/null)
    ok=$(python -c "
import sys
try:
    sys.exit(0 if float('$cpu') < $CPU_BAR and float('$membw') < $MEMBW_BAR else 1)
except ValueError:
    sys.exit(1)" 2>/dev/null && echo 1 || echo 0)
    if [ "$ok" = "1" ]; then streak=$((streak + 1)); else streak=0; fi
    echo "$(date +%H:%M:%S) cpu=$cpu membw=$membw streak=$streak" >> scripts/bench_quiet_probes.log
    if ((streak >= STREAK_NEEDED)); then
        echo "$(date +%H:%M:%S) LAUNCHING bench" >> scripts/bench_quiet_probes.log
        SPARK_GRAFT_BENCH_LABEL="${BENCH_LABEL:-quiet-window record attempt (both legs)}" \
            python bench.py > scripts/bench_quiet_run.log 2>&1
        rc=$?
        echo "$(date +%H:%M:%S) bench exit=$rc" >> scripts/bench_quiet_probes.log
        # propagate the bench's own exit code (ADVICE r16): a caller/cron
        # wrapper must see a failed bench run as a failure, not success
        exit "$rc"
    fi
    sleep 50
done
echo "$(date +%H:%M:%S) GAVE UP after $MAX_POLLS polls" >> scripts/bench_quiet_probes.log
exit 2
