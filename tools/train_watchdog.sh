#!/usr/bin/env sh
# Ride out transient device/tunnel failures: start a run, then re-resume it
# until it completes or the retry budget is spent.
#
# Usage: tools/train_watchdog.sh <name> [max_retries]
#
# The first attempt starts a NEW experiment from the root config.json under
# the given name; every retry resumes the SAME experiment directory from its
# atomic `last` checkpoint (training/checkpoint.py) — each restart is a live
# exercise of the crash-recovery path (reference train.py:72-87 semantics).
# Exit code is the final training exit code.
set -u
name="${1:?usage: train_watchdog.sh <name> [max_retries]}"
max_retries="${2:-20}"

python main.py -n "$name" train
rc=$?
[ "$rc" -eq 0 ] && exit 0

# the run dir is MM-DD_<name>_NNN; resume the newest one matching the name
i=0
while [ "$i" -lt "$max_retries" ]; do
    i=$((i + 1))
    exp=$(ls -dt "${OUTPUT_DIR:-./experiments/}"*"_${name}_"* 2>/dev/null | head -1)
    if [ -z "$exp" ]; then
        echo "watchdog: no experiment dir for '$name'; cannot resume" >&2
        exit "$rc"
    fi
    echo "watchdog: retry $i/$max_retries — resuming $(basename "$exp")" >&2
    sleep 15
    python main.py -n "$(basename "$exp")" --resume train
    rc=$?
    [ "$rc" -eq 0 ] && exit 0
done
exit "$rc"
