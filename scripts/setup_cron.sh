#!/usr/bin/env bash
# Nightly schedule installer (reference scripts/setup_crontab.sh:46-48
# analogue). Appends a crontab entry running the validate chain at 02:17.
set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
TABLES_DIR="${1:?usage: setup_cron.sh TABLES_DIR [REPORT_DIR]}"
REPORT_DIR="${2:-$(dirname "$SCRIPT_DIR")/reports}"
LINE="17 2 * * * ${SCRIPT_DIR}/run_pipeline.sh -- validate --tables ${TABLES_DIR} --report all --report-dir ${REPORT_DIR}"
( crontab -l 2>/dev/null | grep -vF "run_pipeline.sh" || true ; echo "$LINE" ) | crontab -
echo "installed: $LINE"
