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
    for t in TABLES:
        # driver fixtures are single files; GenScale fixtures (sf1/sf3) are
        # Spark-written directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main(sf_dir, out_dir, timeout_s=None, allowed_exclusions=None):
    import os
    fast = os.environ.get("GRAFT_CHECK_FAST") == "1"
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import time
    for name, sql in sorted(oracle.items()):
        t_start = time.time()
        mine_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            if fast:
                mc, mn, mh = fast_signature(con, mine_sql)
            else:
                mc, mn, mh = frame_signature(con.sql(mine_sql))
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "error": f"result read: {e}"}
            continue
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
                    if fast:
                        rc, rn, rh = fast_signature(con, sql)
                    else:
                        rc, rn, rh = frame_signature(con.sql(sql))
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
                if fast:
                    rc, rn, rh = fast_signature(con, sql)
                else:
                    rc, rn, rh = frame_signature(con.sql(sql))
        except KeyboardInterrupt:
            results[name] = {"ok": None, "excluded":
                             f"oracle exceeded {timeout_s}s budget"}
            continue
        except Exception as e:  # noqa: BLE001
            if fired or "INTERRUPT" in str(e).upper():
                results[name] = {"ok": None, "excluded":
                                 f"oracle exceeded {timeout_s}s budget"}
                continue
            msg = str(e)
            if ("max_temp_directory_size" in msg
                    or "No space left" in msg):
                # resource-bound exclusion, same standing as the time
                # budget: recorded, named, and gated by the allowlist
                results[name] = {"ok": None, "excluded":
                                 f"oracle exceeded temp-disk budget: {msg[:120]}"}
                try:
                    con.close()  # release the ENOSPC'd handle
                except Exception:  # noqa: BLE001
                    pass
                con = connect(sf_dir)
                continue
            results[name] = {"ok": False, "error": f"oracle: {msg}"}
            continue
        ok = (mc == rc) and (mn == rn) and (mh == rh)
        results[name] = {
            "ok": ok, "rows": mn, "oracle_rows": rn,
            "cols_match": mc == rc, "hash_match": mh == rh,
            # fast = DuckDB-native order-insensitive 4-reduction signature
            # (weaker than slow's sorted-rows sha256 — see fast_signature)
            "signature_mode": "fast" if fast else "sha256",
        }
        if mc != rc:
            results[name]["cols"] = mc
            results[name]["oracle_cols"] = rc
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
