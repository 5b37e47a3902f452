#!/usr/bin/env bash
# Ops entry point (SURVEY §2.11; reference scripts/run_validation.sh:20-82
# + setup_crontab.sh:46-48 analogue, re-targeted at a Ray cluster).
#
# Runs the engine CLI either directly (local mode) or through
# `ray job submit` against a running cluster, tees the log, and maps the
# engine's exit codes to operator-readable outcomes:
#   0 all checks passed | 1 FAIL rows exist | 2 input error | 3 runtime error
#
# Usage:
#   scripts/run_pipeline.sh [--submit [RAY_ADDRESS]] -- <engine.main args>
#   e.g. scripts/run_pipeline.sh -- quality --input /data/corpus --output /data/out
#        scripts/run_pipeline.sh --submit http://head:8265 -- validate --tables /data/sf
set -u

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PROJECT_DIR="$(dirname "$SCRIPT_DIR")"
LOG_DIR="${PIPELINE_LOG_DIR:-${PROJECT_DIR}/reports}"
mkdir -p "$LOG_DIR"
LOG_FILE="${LOG_DIR}/run_$(date +%Y%m%d_%H%M%S).log"

SUBMIT=""
if [ "${1:-}" = "--submit" ]; then
    shift
    # optional explicit dashboard address; else RAY_ADDRESS / local default
    case "${1:-}" in
        --) ;;
        "") ;;
        *) SUBMIT_ADDR="$1"; shift ;;
    esac
    SUBMIT=1
fi
[ "${1:-}" = "--" ] && shift

echo "== data-quality pipeline run: $(date '+%Y-%m-%d %H:%M:%S')"
echo "   project: ${PROJECT_DIR}"
echo "   log:     ${LOG_FILE}"

if [ -n "$SUBMIT" ]; then
    # ray job submit ships the working dir to the cluster; the engine CLI
    # itself owns the ray.init/shutdown lifecycle on the driver node
    ray job submit \
        ${SUBMIT_ADDR:+--address "$SUBMIT_ADDR"} \
        --working-dir "$PROJECT_DIR" \
        -- python -m engine.main "$@" 2>&1 | tee "$LOG_FILE"
    EXIT_CODE=${PIPESTATUS[0]}
    # ray job submit exits with the Ray CLI's success/failure code, not the
    # engine's 0/1/2/3 contract — recover the engine code from the marker
    # line the CLI prints into the job log
    PARSED=$(grep -o 'ENGINE_EXIT_CODE=[0-9]*' "$LOG_FILE" | tail -1 | cut -d= -f2)
    if [ -n "$PARSED" ]; then
        EXIT_CODE=$PARSED
    elif [ "$EXIT_CODE" -eq 0 ]; then
        EXIT_CODE=3  # job reported success but the engine never ran to its marker
    fi
else
    (cd "$PROJECT_DIR" && python -m engine.main "$@") 2>&1 | tee "$LOG_FILE"
    EXIT_CODE=${PIPESTATUS[0]}
fi

echo "=="
case $EXIT_CODE in
    0) echo "OK: all checks passed" ;;
    1) echo "FAIL: failing checks present (see report)" ;;
    2) echo "INPUT ERROR: missing/unreadable tables or corpus" ;;
    *) echo "RUNTIME ERROR (exit code: ${EXIT_CODE})" ;;
esac
echo "   finished: $(date '+%Y-%m-%d %H:%M:%S')"
echo "   log:      ${LOG_FILE}"
exit $EXIT_CODE
