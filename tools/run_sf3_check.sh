#!/bin/bash
# sf3 correctness certification (round 15): graft.Verify dump -> DuckDB
# oracle compare. Resumable: re-running skips settled results
# (GRAFT_CHECK_RESUME) and Verify skips nothing (dump is idempotent), so
# pass SKIP_VERIFY=1 to go straight to the checker after a first dump.
set -u
cd /root/repo
SF=${SF:-/root/repo/testdata/sf3}
OUT=${OUT:-/root/verify_sf3}
ARTIFACT=${ARTIFACT:-/root/repo/CORRECTNESS_sf3_r15.json}
BUDGET=${BUDGET:-1800}
ALLOW=${ALLOW:-}
mkdir -p "$OUT"
if [ "${SKIP_VERIFY:-0}" != "1" ]; then
  echo "[sf3] verify dump -> $OUT" >&2
  SPARK_GRAFT_VERIFY_ONEFILE=0 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-60g} \
    tools/runjava.sh graft.Verify "$SF" "$OUT" 2> >(tee /tmp/verify_sf3.err >&2) \
    || { echo "[sf3] verify JVM failed" >&2; exit 1; }
  if grep -q "\[verify\].*failed" /tmp/verify_sf3.err; then
    echo "[sf3] PER-QUERY VERIFY FAILURES:" >&2
    grep "\[verify\].*failed" /tmp/verify_sf3.err >&2
  fi
fi
echo "[sf3] DuckDB oracle compare (budget ${BUDGET}s/oracle)" >&2
GRAFT_CHECK_FAST=1 GRAFT_CHECK_TEMP_GB=${GRAFT_CHECK_TEMP_GB:-45} \
  GRAFT_CHECK_MEM_GB=${GRAFT_CHECK_MEM_GB:-80} GRAFT_CHECK_RESUME=1 \
  python3 tools/check_correctness.py "$SF" "$OUT" "$BUDGET" "$ALLOW" \
  > "$ARTIFACT" 2> /tmp/check_sf3.err
rc=$?
tail -5 /tmp/check_sf3.err >&2
echo "[sf3] checker exit $rc; artifact: $ARTIFACT" >&2
exit $rc
