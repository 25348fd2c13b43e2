#!/bin/bash
# Quick oracle check for a subset: scripts/check_one.sh <names-csv> [sfdir]
NAMES="$1"; SF="${2:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/v_one.XXXX)
SPARK_GRAFT_ONLY="$NAMES" scripts/run.sh graft.Verify "$SF" "$OUT" 2>&1 | grep -E '^\[verify\].*failed'
python3 scripts/selfcheck.py "$OUT" "$SF" 2>/dev/null | grep -Ev 'No files found'
rm -rf "$OUT"
