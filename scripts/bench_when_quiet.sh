#!/bin/bash
# Poll the ambient CPU probe once a minute; when 3 consecutive readings are
# below 0.15 (the launch bar from the round-workflow protocol), run the
# sf0.1 bench record.  Gives up after MAX_POLLS minutes so the round's
# driver never inherits a zombie.  Output -> scripts/bench_quiet_run.log;
# probe trace -> scripts/bench_quiet_probes.log.
cd /root/repo || exit 1
MAX_POLLS=${MAX_POLLS:-90}
STREAK_NEEDED=${STREAK_NEEDED:-3}
BAR=${BAR:-0.15}
streak=0
: > scripts/bench_quiet_probes.log
for ((i = 1; i <= MAX_POLLS; i++)); do
    cpu=$(python -c "from bench import _ambient_calibration as c; print(c())" 2>/dev/null)
    echo "$(date +%H:%M:%S) cpu=$cpu streak=$streak" >> scripts/bench_quiet_probes.log
    if python -c "import sys; sys.exit(0 if float('$cpu') < $BAR else 1)" 2>/dev/null; then
        streak=$((streak + 1))
    else
        streak=0
    fi
    if ((streak >= STREAK_NEEDED)); then
        echo "$(date +%H:%M:%S) LAUNCHING bench" >> scripts/bench_quiet_probes.log
        SPARK_GRAFT_BENCH_LABEL="${BENCH_LABEL:-quiet-window record attempt}" \
            python bench.py > scripts/bench_quiet_run.log 2>&1
        rc=$?  # capture BEFORE the $(date) substitution below resets $?
        echo "$(date +%H:%M:%S) bench exit=$rc" >> scripts/bench_quiet_probes.log
        exit 0
    fi
    sleep 55
done
echo "$(date +%H:%M:%S) GAVE UP after $MAX_POLLS polls" >> scripts/bench_quiet_probes.log
exit 2
