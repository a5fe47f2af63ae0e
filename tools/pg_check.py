#!/usr/bin/env python3
"""Execute the GENERATED postgres-dialect merge SQL through DuckDB's
pg-compatible surface and assert it converges to the Derby-verified state.

The Derby arm of the merge protocol is executed end-to-end by
`JdbcLiveSpec` (embedded Derby). The postgres arm — the deployment path,
reference src/lib/client.js:871-1118 — has no pg server in this sandbox,
but every statement it generates (DELETE .. USING, UPDATE .. FROM with
IS DISTINCT FROM, partitioned ROW_NUMBER dedup insert, DELETE+INSERT
state upsert) is valid DuckDB SQL, so the closest executable projection
is: run the statements VERBATIM in DuckDB on the JdbcLiveSpec fixtures
and require the same final state.

Usage:
  sbt "runMain graft.sink.MergeSqlDump /tmp/merge_sql.json"
  python3 tools/pg_check.py /tmp/merge_sql.json

Driver-side tooling only — the shipped Scala library never imports this.
"""
import json
import sys

import duckdb

EXPECTED_TARGET = {
    "/r/1": (200, '{"v": 11}'),   # changed payload -> updated
    "/r/2": (100, '{"v": 2}'),    # same payload -> change-detect skips
    "/r/4": (200, '{"v": 4}'),    # new -> inserted; /r/3 tombstoned
}
EXPECTED_STATE = [("apptable", "delta", 200)]


def fresh(con):
    for t in ("apptable", "staging", "deletes", "sri2db_synctimes"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    con.execute("CREATE TABLE apptable (href VARCHAR NOT NULL, "
                "modified_ms BIGINT, jsondata VARCHAR)")
    con.execute("CREATE TABLE staging (href VARCHAR NOT NULL, "
                "modified_ms BIGINT, jsondata VARCHAR)")
    con.execute("CREATE TABLE deletes (href VARCHAR NOT NULL)")
    con.execute("CREATE TABLE sri2db_synctimes (tablename VARCHAR, "
                "synctype VARCHAR, lastmodified BIGINT, syncstart BIGINT)")
    con.execute("INSERT INTO apptable VALUES "
                "('/r/1', 100, '{\"v\": 1}'), "
                "('/r/2', 100, '{\"v\": 2}'), "
                "('/r/3', 100, '{\"v\": 3}')")
    con.execute("INSERT INTO deletes VALUES ('/r/3')")


def stage_delta(con):
    con.execute("INSERT INTO staging VALUES "
                "('/r/1', 200, '{\"v\": 11}'), "
                "('/r/2', 200, '{\"v\": 2}'), "
                "('/r/4', 200, '{\"v\": 4}')")


def run_merge(con, pg):
    # statement order from JdbcMergeSink.mergeAndCommit (delta path)
    con.execute("BEGIN")
    con.execute(pg["delete"])
    con.execute(pg["update"])
    con.execute(pg["insert"])
    for s in pg["state"]:
        con.execute(s)
    con.execute("COMMIT")


def target(con):
    return {h: (m, j) for h, m, j in
            con.execute("SELECT * FROM apptable").fetchall()}


def main(path):
    pg = json.load(open(path))["postgres"]
    con = duckdb.connect()
    failures = []

    # scenario 1: stage + merge converges to the Derby-verified state
    fresh(con)
    stage_delta(con)
    run_merge(con, pg)
    if target(con) != EXPECTED_TARGET:
        failures.append(f"merge state mismatch: {target(con)}")
    state = con.execute("SELECT tablename, synctype, lastmodified "
                        "FROM sri2db_synctimes").fetchall()
    if state != EXPECTED_STATE:
        failures.append(f"synctimes mismatch: {state}")

    # scenario 2: replaying the staged batch is idempotent
    con.execute("TRUNCATE staging")
    stage_delta(con)
    run_merge(con, pg)
    if target(con) != EXPECTED_TARGET:
        failures.append(f"replay not idempotent: {target(con)}")
    nstate = con.execute("SELECT count(*) FROM sri2db_synctimes").fetchone()[0]
    if nstate != 1:
        failures.append(f"state upsert left {nstate} rows after replay")

    # scenario 3: full-sync prune removes rows absent from staging
    fresh(con)
    stage_delta(con)
    con.execute(pg["prune"])
    left = sorted(h for (h,) in con.execute("SELECT href FROM apptable")
                  .fetchall())
    if left != ["/r/1", "/r/2"]:  # /r/3 absent from staging -> pruned
        failures.append(f"prune kept wrong rows: {left}")

    # scenario 4: window-dedup insert keeps ONE newest row per key even
    # when staging carries several versions (the pg arm's ROW_NUMBER
    # dedup, which the key-unique Derby arm never exercises)
    fresh(con)
    con.execute("INSERT INTO staging VALUES "
                "('/r/9', 100, 'old'), ('/r/9', 300, 'new'), "
                "('/r/9', 200, 'mid')")
    con.execute(pg["insert"])
    rows = con.execute("SELECT modified_ms, jsondata FROM apptable "
                       "WHERE href = '/r/9'").fetchall()
    if rows != [(300, "new")]:
        failures.append(f"window dedup insert wrong: {rows}")

    # scenario 5: safe-sync reconcile (delete-not-in-members + dedup
    # insert of fetched missing rows) converges to the state JdbcLiveSpec
    # pins against Merge.safe: /r/3 left the member list -> deleted;
    # /r/5 is a missing member fetched in two versions -> newest inserted
    fresh(con)
    con.execute("CREATE TABLE members (href VARCHAR NOT NULL)")
    con.execute("CREATE TABLE missing (href VARCHAR NOT NULL, "
                "modified_ms BIGINT, jsondata VARCHAR)")
    con.execute("INSERT INTO members VALUES ('/r/1'), ('/r/2'), ('/r/5')")
    con.execute("INSERT INTO missing VALUES "
                "('/r/5', 150, '{\"v\": 5}'), ('/r/5', 250, '{\"v\": 55}')")
    con.execute("BEGIN")
    con.execute(pg["safe_delete"])
    con.execute(pg["safe_insert"])
    con.execute("COMMIT")
    expected_safe = {
        "/r/1": (100, '{"v": 1}'),
        "/r/2": (100, '{"v": 2}'),
        "/r/5": (250, '{"v": 55}'),  # windowed dedup keeps the newest
    }
    if target(con) != expected_safe:
        failures.append(f"safe-sync state mismatch: {target(con)}")

    # scenario 6: safe-sync replay is idempotent (delete removes nothing,
    # NOT EXISTS skips the now-present key -- no duplicate /r/5)
    con.execute(pg["safe_delete"])
    con.execute(pg["safe_insert"])
    if target(con) != expected_safe:
        failures.append(f"safe-sync replay not idempotent: {target(con)}")
    con.execute("DROP TABLE members")
    con.execute("DROP TABLE missing")

    if failures:
        print("PG-DIALECT CHECK FAILED")
        for f in failures:
            print(" -", f)
        return 1
    print("pg dialect: 6/6 scenarios converge to the Derby-verified state")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/merge_sql.json"))
