#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against DuckDB
views over the same sf parquet tables; compares row counts, column names and
a hash of sorted values (columns sorted by name, rows sorted by all columns).
"""
import json
import math
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_signature(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in canon_rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return sorted(cols), len(rows), h.hexdigest()


def fast_signature(con, src_sql):
    """DuckDB-native equivalent of frame_signature for large SFs: the
    Python canon+sort path costs ~35 s per 6M-row side, so above sf0.1 the
    signature is computed inside DuckDB — name-sorted columns, NULLs
    canonicalized to 'NULL', values VARCHAR-cast, rows reduced
    ORDER-INSENSITIVELY. A bare sum of per-row hashes admits hash-SUM
    collisions (distinct multisets with equal sums), so the signature
    combines count + sum + bit_xor of the row hashes AND the same two
    reductions at a second salt (hash(row || const)): a colliding pair
    must now match four independent 64-bit reductions at two salts
    simultaneously. Still a strictly weaker certificate than the slow
    path's sorted-rows sha256 — the per-query results record which mode
    produced them (signature_mode) so artifacts are honest about it.
    Both sides run the identical wrapper on the same engine, so equal
    signatures certify equal row multisets over equal column sets; the
    hash VALUE is not comparable with frame_signature's sha256 (both
    sides must use the same mode).
    """
    desc = con.sql(f"SELECT * FROM ({src_sql}) LIMIT 0").description
    cols = sorted(d[0] for d in desc)
    row = " || chr(31) || ".join(
        f"coalesce(CAST(\"{c}\" AS VARCHAR), 'NULL')" for c in cols)
    n, h_sum, h_xor, g_sum, g_xor = con.sql(
        f"SELECT count(*), "
        f"coalesce(sum(hash({row})), 0)::HUGEINT, "
        f"coalesce(bit_xor(hash({row})), 0)::HUGEINT, "
        f"coalesce(sum(hash({row} || chr(30) || 'graft-salt-2')), 0)::HUGEINT, "
        f"coalesce(bit_xor(hash({row} || chr(30) || 'graft-salt-2')), 0)::HUGEINT "
        f"FROM ({src_sql})").fetchone()
    return cols, n, f"{h_sum}|{h_xor}|{g_sum}|{g_xor}"


def connect(sf_dir):
    import os
    con = duckdb.connect()
    # bound oracle spill: a token-join oracle CTE can legitimately demand
    # more temp than the box has (measured: q_graph_pagerank at sf1 filled
    # 75 GB and died on ENOSPC mid-artifact) — cap it so resource blow-ups
    # surface as clean, recordable exclusions instead of environment crashes
    tmp_gb = os.environ.get("GRAFT_CHECK_TEMP_GB")
    if tmp_gb:
        con.execute(f"SET temp_directory='/tmp/duckdb_check_tmp'")
        con.execute(f"SET max_temp_directory_size='{tmp_gb}GB'")
    # bound oracle RAM the same way: DuckDB's default is 80% of the box,
    # and one pathological oracle took the whole process to 130 GB RSS and
    # an OOM kill (q_embed_ivfpq at sf3) — the kernel's kill loses every
    # result of the run, unlike a clean per-query Out-of-Memory error,
    # which the loop records as a resource exclusion and moves past
    mem_gb = os.environ.get("GRAFT_CHECK_MEM_GB")
    if mem_gb:
        con.execute(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        # driver fixtures are single files; GenScale fixtures (sf1/sf3) are
        # Spark-written directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def subset_recall_check(con, mine_sql, oracle_sql, floor):
    """Compare mode for PROBABILISTIC operators (LSH candidate generation):
    exact multiset equality must eventually fail at scale — banded MinHash
    misses a just-at-threshold pair with odds (1-t^r)^b per pair — so the
    honest certificate is (a) PRECISION 1: every emitted row appears in the
    oracle (these operators verify candidates exactly, so a false pair is a
    real bug, never tolerated), via a multiset EXCEPT ALL; (b) RECALL >=
    the operator's theory floor. Exact-by-construction operators keep the
    exact signature path instead."""
    cols = sorted(d[0] for d in
                  con.sql(f"SELECT * FROM ({mine_sql}) LIMIT 0").description)
    ocols = sorted(d[0] for d in
                   con.sql(f"SELECT * FROM ({oracle_sql}) LIMIT 0").description)
    if cols != ocols:
        return {"ok": False, "error": f"cols: {cols} vs {ocols}"}
    collist = ", ".join(f'"{c}"' for c in cols)
    # Materialize the oracle ONCE: these are exactly the all-pairs oracles
    # whose runtime motivated the timeout/resource budgets, so running the
    # SQL both inside the EXCEPT ALL and again for the standalone count
    # doubled the dominant cost of every subset_recall query.
    con.execute("DROP TABLE IF EXISTS __graft_oracle_once")
    con.execute(
        f"CREATE TEMP TABLE __graft_oracle_once AS SELECT {collist} "
        f"FROM ({oracle_sql})")
    try:
        n_extra, n_mine = con.sql(
            f"SELECT (SELECT count(*) FROM (SELECT {collist} FROM ({mine_sql}) "
            f"EXCEPT ALL SELECT {collist} FROM __graft_oracle_once)), "
            f"(SELECT count(*) FROM ({mine_sql}))").fetchone()
        n_oracle = con.sql(
            "SELECT count(*) FROM __graft_oracle_once").fetchone()[0]
    finally:
        try:
            con.execute("DROP TABLE IF EXISTS __graft_oracle_once")
        except Exception:  # noqa: BLE001 — interrupted handle; caller reconnects
            pass
    recall = (n_mine / n_oracle) if n_oracle else 1.0
    return {"ok": n_extra == 0 and recall >= floor,
            "rows": n_mine, "oracle_rows": n_oracle,
            "false_pairs": n_extra, "recall": round(recall, 6),
            "recall_floor": floor, "signature_mode": "subset_recall"}


def main(sf_dir, out_dir, timeout_s=None, allowed_exclusions=None):
    import os
    fast = os.environ.get("GRAFT_CHECK_FAST") == "1"
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    modes = {}
    if os.path.exists(f"{out_dir}/oracle_compare.json"):
        modes = json.load(open(f"{out_dir}/oracle_compare.json"))
    results = {}
    import time
    # crash insurance: every per-query result appends to a JSONL sidecar
    # the moment it exists, and GRAFT_CHECK_RESUME=1 preloads + skips the
    # queries already recorded there — a kernel OOM kill (measured: one
    # run lost 40 minutes of results) costs one query, not the run
    progress_path = f"{out_dir}/check_progress.jsonl"
    if os.environ.get("GRAFT_CHECK_RESUME") == "1" \
            and os.path.exists(progress_path):
        dropped = 0
        for line in open(progress_path):
            line = line.strip()
            if not line:
                continue
            # a kernel OOM kill mid-append (the exact scenario this sidecar
            # insures against) can truncate the final line — skip unparseable
            # lines instead of crashing every subsequent resume
            try:
                rec = json.loads(line)
            except ValueError:
                dropped += 1
                continue
            # skip only settled results: ok==true (pass) or an excluded
            # marker (ok is None). A recorded error/mismatch (ok==false) may
            # be transient (e.g. a half-written parquet dir) — re-run it so
            # a resumed run can heal instead of pinning the failure
            if rec.get("ok") is True or "excluded" in rec:
                results[rec.pop("__name__")] = rec
            else:
                dropped += 1
        print(f"[check] resumed {len(results)} results from "
              f"{progress_path}"
              + (f" ({dropped} unparseable/failed lines re-run)"
                 if dropped else ""),
              file=sys.stderr, flush=True)
    elif os.path.exists(progress_path):
        os.remove(progress_path)

    def record(name, res):
        results[name] = res
        with open(progress_path, "a") as f:
            f.write(json.dumps({"__name__": name, **res}) + "\n")
    for name, sql in sorted(oracle.items()):
        if name in results:
            continue
        t_start = time.time()
        mine_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        mode = modes.get(name, "exact")
        recall_floor = (float(mode.split(":", 1)[1])
                        if mode.startswith("subset_recall") else None)
        if recall_floor is None:
            try:
                if fast:
                    mc, mn, mh = fast_signature(con, mine_sql)
                else:
                    mc, mn, mh = frame_signature(con.sql(mine_sql))
            except Exception as e:  # noqa: BLE001
                record(name, {"ok": False, "error": f"result read: {e}"})
                print(f"[check] {name} ERROR (result read) "
                      f"{time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
                continue
        def compute():
            if recall_floor is not None:
                return subset_recall_check(con, mine_sql, sql, recall_floor)
            if fast:
                return fast_signature(con, sql)
            return frame_signature(con.sql(sql))
        fired = False
        try:
            if timeout_s:
                # budget the ORACLE side: a handful of oracle SQLs are
                # deliberately quadratic comparators (exact all-pairs) whose
                # DuckDB cost explodes with sf — above sf0.01 they are
                # excluded BY MEASUREMENT (interrupt past the budget), with
                # the exclusion recorded instead of silently skipped.
                # The interrupt is identity-guarded: fire only while THIS
                # query is still running (timer vs completion is a race —
                # an unguarded con.interrupt() can land after the query
                # finishes and poison the NEXT query's execution), and any
                # fired interrupt discards the connection afterwards so no
                # latent flag leaks forward.
                import threading
                lock = threading.Lock()
                state = {"done": False, "fired": False}

                def fire():
                    with lock:
                        if not state["done"]:
                            state["fired"] = True
                            con.interrupt()
                timer = threading.Timer(timeout_s, fire)
                timer.start()
                try:
                    computed = compute()
                finally:
                    with lock:
                        state["done"] = True
                        fired = state["fired"]
                    timer.cancel()
                    if fired:
                        try:
                            con.close()  # release the interrupted handle
                        except Exception:  # noqa: BLE001
                            pass
                        con = connect(sf_dir)
            else:
                computed = compute()
        except KeyboardInterrupt:
            record(name, {"ok": None, "excluded":
                              f"oracle exceeded {timeout_s}s budget"})
            print(f"[check] {name} EXCLUDED (budget) "
                  f"{time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
            continue
        except Exception as e:  # noqa: BLE001
            if fired or "INTERRUPT" in str(e).upper():
                record(name, {"ok": None, "excluded":
                                  f"oracle exceeded {timeout_s}s budget"})
                print(f"[check] {name} EXCLUDED (budget) "
                      f"{time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
                continue
            msg = str(e)
            if ("max_temp_directory_size" in msg
                    or "No space left" in msg
                    or "Out of Memory" in msg
                    or "OutOfMemory" in msg):
                # resource-bound exclusion (temp disk or RAM), same
                # standing as the time budget: recorded, named, and gated
                # by the allowlist
                record(name, {"ok": None, "excluded":
                                  f"oracle exceeded resource budget: {msg[:120]}"})
                print(f"[check] {name} EXCLUDED (resource) "
                      f"{time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
                try:
                    con.close()  # release the ENOSPC'd handle
                except Exception:  # noqa: BLE001
                    pass
                con = connect(sf_dir)
                continue
            record(name, {"ok": False, "error": f"oracle: {msg}"})
            print(f"[check] {name} ERROR {time.time() - t_start:.1f}s",
                  file=sys.stderr, flush=True)
            continue
        if recall_floor is not None:
            record(name, computed)
            ok = computed.get("ok")
        else:
            rc, rn, rh = computed
            ok = (mc == rc) and (mn == rn) and (mh == rh)
            res = {
                "ok": ok, "rows": mn, "oracle_rows": rn,
                "cols_match": mc == rc, "hash_match": mh == rh,
                # fast = DuckDB-native order-insensitive 4-reduction signature
                # (weaker than slow's sorted-rows sha256 — see fast_signature)
                "signature_mode": "fast" if fast else "sha256",
            }
            if mc != rc:
                res["cols"] = mc
                res["oracle_cols"] = rc
            record(name, res)
        print(f"[check] {name} {'ok' if ok else 'MISMATCH'} "
              f"{time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    excluded = sorted(k for k, r in results.items() if r.get("ok") is None)
    # exclusions pass the gate only when expected BY NAME: a query that
    # times out unexpectedly (e.g. a regressed oracle, or the interrupt
    # race this tool used to have) must fail loudly, not vanish into the
    # exclusion count
    unexpected = [k for k in excluded if k not in (allowed_exclusions or [])]
    print(json.dumps(results, indent=1))
    if excluded:
        print(f"\n{n_ok}/{len(results) - len(excluded)} included queries "
              f"match ({len(excluded)} oracle-budget exclusions: "
              f"{','.join(excluded)})", file=sys.stderr)
    else:
        print(f"\n{n_ok}/{len(results)} queries match", file=sys.stderr)
    if unexpected:
        print(f"UNEXPECTED exclusions (not in allowlist): "
              f"{','.join(unexpected)}", file=sys.stderr)
    return 0 if (n_ok == len(results) - len(excluded)
                 and not unexpected) else 1


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else None
    # an empty-string argv[4] means "no allowlist", not allowlist=[''] —
    # the latter flagged every REAL exclusion as unexpected
    allow = ([a for a in sys.argv[4].split(",") if a.strip()] or None) \
        if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], t, allow))
