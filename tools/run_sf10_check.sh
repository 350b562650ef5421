#!/bin/bash
# sf10 correctness certification (round 15, resumed): dump the queries not
# yet settled by tools/sf10_check_progress_r15.jsonl, restore that progress
# file, and run the DuckDB compare with resume. Two dump passes: A = the
# 153 ordinary queries; B = the three pair-dump giants (simhash_pairs
# ~5.7B rows, entity_resolution ~2.6B, phash_pairs ~300M at sf10) so the
# bulk of the suite settles before the big writes land on disk.
# Env knobs: SKIP_A=1 / SKIP_B=1 skip a dump pass; BUDGET (s/oracle).
set -u
cd /root/repo
SF=${SF:-/root/repo/testdata/sf10}
OUT=${OUT:-/root/verify_sf10}
ARTIFACT=${ARTIFACT:-/root/repo/CORRECTNESS_sf10_r15.json}
BUDGET=${BUDGET:-2000}
ALLOW=${ALLOW:-q_embed_ivfpq,q_dedup_keep_best,q_embed_kmeans}
mkdir -p "$OUT"
if [ ! -f "$OUT/check_progress.jsonl" ]; then
  cp tools/sf10_check_progress_r15.jsonl "$OUT/check_progress.jsonl"
  echo "[sf10] restored $(wc -l < "$OUT/check_progress.jsonl") settled results" >&2
fi
dump() { # $1 = names file, $2 = label
  echo "[sf10] dump pass $2 -> $OUT" >&2
  SPARK_GRAFT_VERIFY_ONEFILE=0 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-60g} \
    tools/runjava.sh graft.Verify "$SF" "$OUT" "$(cat "$1")" \
    2> >(tee "/tmp/verify_sf10_$2.err" >&2) \
    || { echo "[sf10] verify JVM pass $2 failed" >&2; exit 1; }
  grep "\[verify\].*failed" "/tmp/verify_sf10_$2.err" >&2 || true
  df -h / | tail -1 >&2
}
[ "${SKIP_A:-0}" = "1" ] || dump tools/sf10_passA_names.txt A
[ "${SKIP_B:-0}" = "1" ] || dump tools/sf10_passB_names.txt B
# Each dump pass overwrote oracle_sql.json with only its own names; the
# checker must see every unsettled query, so regenerate the FULL sidecars
# (cheap: OracleDump only writes json, runs no queries).
tools/runjava.sh graft.tools.OracleDump "$OUT" >&2 \
  || { echo "[sf10] OracleDump failed" >&2; exit 1; }
echo "[sf10] DuckDB oracle compare (budget ${BUDGET}s/oracle)" >&2
GRAFT_CHECK_FAST=1 GRAFT_CHECK_TEMP_GB=${GRAFT_CHECK_TEMP_GB:-45} \
  GRAFT_CHECK_MEM_GB=${GRAFT_CHECK_MEM_GB:-80} GRAFT_CHECK_RESUME=1 \
  python3 tools/check_correctness.py "$SF" "$OUT" "$BUDGET" "$ALLOW" \
  > "$ARTIFACT" 2> /tmp/check_sf10.err
rc=$?
tail -5 /tmp/check_sf10.err >&2
echo "[sf10] checker exit $rc; artifact: $ARTIFACT" >&2
exit $rc
