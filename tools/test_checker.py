#!/usr/bin/env python3
"""Self-test for check_correctness.py's gating behavior.

Covers the contracts the correctness artifacts lean on:
  1. an exclusion (oracle over time budget) OUTSIDE the allowlist makes the
     gate exit nonzero, even when every included query matches;
  2. the same exclusion INSIDE the allowlist passes;
  3. an empty allowlist argv is "no allowlist", not allowlist=[''];
  4. fast-mode signatures: equal frames match, a single tweaked value
     mismatches (the 4-reduction signature catches it), and the recorded
     signature_mode is honest about which certificate was produced.

Run: python3 tools/test_checker.py [sf_dir]   (default /root/testdata/sf0.001)
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CHECKER = os.path.join(HERE, "check_correctness.py")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# an oracle that cannot finish inside a 0.2 s budget (pure compute blow-up,
# no disk): forces the measured-exclusion path deterministically
SLOW_SQL = ("SELECT count(*) AS n FROM range(200000) a, range(200000) b "
            "WHERE (a.range * b.range) % 7 = 3")
OK_SQL = "SELECT r_regionkey, r_name FROM region"


def make_outdir(tweak=False):
    import duckdb
    d = tempfile.mkdtemp(prefix="graft_checker_selftest_")
    con = duckdb.connect()
    val = "r_name" if not tweak else "r_name || '-x'"
    os.makedirs(f"{d}/q_ok")
    con.execute(
        f"COPY (SELECT r_regionkey, {val} AS r_name FROM '{SF}/region.parquet') "
        f"TO '{d}/q_ok/part-0.parquet' (FORMAT PARQUET)")
    os.makedirs(f"{d}/q_slow_oracle")
    con.execute(
        f"COPY (SELECT 1::BIGINT AS n) TO '{d}/q_slow_oracle/part-0.parquet' "
        f"(FORMAT PARQUET)")
    with open(f"{d}/oracle_sql.json", "w") as f:
        json.dump({"q_ok": OK_SQL, "q_slow_oracle": SLOW_SQL}, f)
    con.close()
    return d


def run(outdir, timeout, allow_arg=None, fast=False, env_extra=None):
    env = dict(os.environ)
    env.pop("GRAFT_CHECK_FAST", None)
    env.pop("GRAFT_CHECK_RESUME", None)
    if fast:
        env["GRAFT_CHECK_FAST"] = "1"
    if env_extra:
        env.update(env_extra)
    cmd = [sys.executable, CHECKER, SF, outdir, str(timeout)]
    if allow_arg is not None:
        cmd.append(allow_arg)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    try:
        results = json.loads(r.stdout)
    except json.JSONDecodeError:
        results = {}
    return r.returncode, results, r.stderr


def main():
    failures = []

    def check(label, cond, detail=""):
        print(f"[self-test] {'ok  ' if cond else 'FAIL'} {label} {detail}",
              file=sys.stderr)
        if not cond:
            failures.append(label)

    out = make_outdir()
    try:
        # 1. exclusion outside allowlist -> nonzero exit
        rc, res, _ = run(out, 0.2, allow_arg=None)
        check("exclusion outside allowlist exits nonzero", rc != 0, f"rc={rc}")
        check("slow oracle recorded as exclusion",
              res.get("q_slow_oracle", {}).get("ok") is None, str(res.get("q_slow_oracle")))
        check("included query still matches", res.get("q_ok", {}).get("ok") is True)

        # 2. allowlisted exclusion -> zero exit
        rc2, res2, _ = run(out, 0.2, allow_arg="q_slow_oracle")
        check("allowlisted exclusion exits zero", rc2 == 0, f"rc={rc2}")

        # 3. empty allowlist argv == no allowlist (was allowlist=[''])
        rc3, _, _ = run(out, 0.2, allow_arg="")
        check("empty allowlist arg behaves as none (nonzero exit)", rc3 != 0,
              f"rc={rc3}")

        # 4. fast mode: equal frames match; recorded mode is honest
        rc4, res4, _ = run(out, 0.2, allow_arg="q_slow_oracle", fast=True)
        check("fast mode passes equal frames", rc4 == 0 and
              res4.get("q_ok", {}).get("ok") is True, f"rc={rc4}")
        check("fast mode records signature_mode=fast",
              res4.get("q_ok", {}).get("signature_mode") == "fast")
        rcs, ress, _ = run(out, 0.2, allow_arg="q_slow_oracle", fast=False)
        check("slow mode records signature_mode=sha256",
              ress.get("q_ok", {}).get("signature_mode") == "sha256")
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # 5. fast mode catches a single tweaked value
    out2 = make_outdir(tweak=True)
    try:
        rc5, res5, _ = run(out2, 0.2, allow_arg="q_slow_oracle", fast=True)
        check("fast mode flags a tweaked value", rc5 != 0 and
              res5.get("q_ok", {}).get("ok") is False, f"rc={rc5}")
    finally:
        shutil.rmtree(out2, ignore_errors=True)

    # 6. subset_recall mode: result must be a SUBSET of the oracle
    #    (precision 1) with row-count recall above the floor
    def make_subset_outdir(mine_rows, floor):
        import duckdb
        d = tempfile.mkdtemp(prefix="graft_checker_subset_")
        con = duckdb.connect()
        os.makedirs(f"{d}/q_sub")
        con.execute(
            f"COPY (SELECT * FROM (VALUES {mine_rows}) t(a, b)) "
            f"TO '{d}/q_sub/part-0.parquet' (FORMAT PARQUET)")
        with open(f"{d}/oracle_sql.json", "w") as f:
            # oracle = the 4 pairs (1,2),(1,3),(2,3),(4,5)
            json.dump({"q_sub": "SELECT * FROM (VALUES (1, 2), (1, 3), "
                                "(2, 3), (4, 5)) t(a, b)"}, f)
        with open(f"{d}/oracle_compare.json", "w") as f:
            json.dump({"q_sub": f"subset_recall:{floor}"}, f)
        con.close()
        return d

    # full set -> recall 1, passes at any floor
    out6 = make_subset_outdir("(1, 2), (1, 3), (2, 3), (4, 5)", 0.999)
    try:
        rc6, res6, _ = run(out6, 5)
        check("subset_recall passes the full set", rc6 == 0 and
              res6.get("q_sub", {}).get("ok") is True, str(res6.get("q_sub")))
        check("subset_recall records mode and recall",
              res6.get("q_sub", {}).get("signature_mode") == "subset_recall"
              and res6.get("q_sub", {}).get("recall") == 1.0)
    finally:
        shutil.rmtree(out6, ignore_errors=True)
    # one miss at floor 0.999 -> recall 0.75 fails; at floor 0.7 passes
    out7 = make_subset_outdir("(1, 2), (1, 3), (2, 3)", 0.999)
    try:
        rc7, res7, _ = run(out7, 5)
        check("subset_recall fails below the floor", rc7 != 0 and
              res7.get("q_sub", {}).get("ok") is False, str(res7.get("q_sub")))
    finally:
        shutil.rmtree(out7, ignore_errors=True)
    out8 = make_subset_outdir("(1, 2), (1, 3), (2, 3)", 0.7)
    try:
        rc8, res8, _ = run(out8, 5)
        check("subset_recall passes above the floor", rc8 == 0 and
              res8.get("q_sub", {}).get("ok") is True, str(res8.get("q_sub")))
    finally:
        shutil.rmtree(out8, ignore_errors=True)
    # a FALSE pair fails regardless of recall (precision is never relaxed)
    out9 = make_subset_outdir("(1, 2), (1, 3), (2, 3), (4, 5), (9, 9)", 0.7)
    try:
        rc9, res9, _ = run(out9, 5)
        check("subset_recall rejects a false pair", rc9 != 0 and
              res9.get("q_sub", {}).get("ok") is False
              and res9.get("q_sub", {}).get("false_pairs") == 1,
              str(res9.get("q_sub")))
    finally:
        shutil.rmtree(out9, ignore_errors=True)

    # 7. resume semantics: a truncated trailing progress line (kernel kill
    #    mid-append) must not crash the resume; a recorded FAILURE must be
    #    re-run (it may have been transient); a recorded PASS is skipped.
    out10 = make_outdir()
    try:
        with open(f"{out10}/check_progress.jsonl", "w") as f:
            # settled exclusion: skipped on resume (stays excluded)
            f.write(json.dumps({"__name__": "q_slow_oracle", "ok": None,
                                "excluded": "oracle exceeded 0.2s budget"}) + "\n")
            # recorded transient failure: must be RE-RUN (and now passes)
            f.write(json.dumps({"__name__": "q_ok", "ok": False,
                                "error": "result read: transient"}) + "\n")
            # truncated final line: must be tolerated, not crash the resume
            f.write('{"__name__": "q_trunc", "ok": tr')
        rc10, res10, err10 = run(out10, 30, allow_arg="q_slow_oracle",
                                 env_extra={"GRAFT_CHECK_RESUME": "1"})
        check("resume tolerates truncated line + heals failure", rc10 == 0,
              f"rc={rc10} stderr={err10[-200:]}")
        check("resume re-ran the recorded failure to a pass",
              res10.get("q_ok", {}).get("ok") is True, str(res10.get("q_ok")))
        check("resume kept the settled exclusion without re-running",
              res10.get("q_slow_oracle", {}).get("ok") is None,
              str(res10.get("q_slow_oracle")))
        # a recorded PASS is skipped: seed an impossible marker value and
        # verify it survives (a re-run would have replaced it)
        with open(f"{out10}/check_progress.jsonl", "w") as f:
            f.write(json.dumps({"__name__": "q_ok", "ok": True,
                                "rows": -1}) + "\n")
            f.write(json.dumps({"__name__": "q_slow_oracle", "ok": None,
                                "excluded": "oracle exceeded 0.2s budget"}) + "\n")
        rc11, res11, _ = run(out10, 30, allow_arg="q_slow_oracle",
                             env_extra={"GRAFT_CHECK_RESUME": "1"})
        check("resume skips a settled pass", rc11 == 0 and
              res11.get("q_ok", {}).get("rows") == -1, str(res11.get("q_ok")))
    finally:
        shutil.rmtree(out10, ignore_errors=True)

    if failures:
        print(f"[self-test] {len(failures)} FAILURES: {failures}", file=sys.stderr)
        return 1
    print("[self-test] all checks passed", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
