#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against views over the
sfDir parquet tables, and compares: schema (column names), row count, and
values (rows sorted, columns sorted by name). Exact equality for ints /
strings / dates; doubles compared bitwise-exact first, then with 1e-12
relative tolerance reported separately.

Driver-side tooling only — the shipped Scala library never imports this.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        # Arrow-level type check: DuckDB SUM(int) yields HUGEINT → arrow
        # decimal128, which the driver's hasher renders differently from
        # Spark's int64 even when the numbers are equal (r1: q12/q17/
        # txt_stats/win_running_sum). Python-level == hides it, so compare
        # physical types explicitly.
        tdiff = []
        for c in wcols:
            wt = want.schema.field(c).type
            gt = got.schema.field(c).type
            if str(wt) != str(gt):
                tdiff.append((c, str(wt), str(gt)))
        if tdiff:
            print(f"FAIL {name}: arrow type mismatch (oracle vs spark): {tdiff}")
            n_fail += 1
            continue
        skey = lambda r: [(v is None, str(v)) for v in r]
        wrows = sorted([tuple(r[c] for c in wcols) for r in want.to_pylist()], key=skey)
        grows = sorted([tuple(r[c] for c in gcols) for r in got.to_pylist()], key=skey)
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        exact = True
        close = True
        first_diff = None
        for wr, gr in zip(wrows, grows):
            for wv, gv in zip(wr, gr):
                if wv == gv or (wv is None and gv is None):
                    continue
                exact = False
                if isinstance(wv, float) and isinstance(gv, float):
                    if math.isclose(wv, gv, rel_tol=1e-12, abs_tol=1e-12):
                        continue
                close = False
                if first_diff is None:
                    first_diff = (wr, gr)
                break
            if first_diff:
                break
        if exact:
            print(f"PASS {name} ({len(grows)} rows, exact)")
            n_pass += 1
        elif close:
            print(f"WARN {name} ({len(grows)} rows): values within 1e-12 but "
                  f"NOT bit-exact — hash compare may fail")
            n_fail += 1
        else:
            print(f"FAIL {name}: first diff\n  oracle={first_diff[0]}\n  "
                  f"spark ={first_diff[1]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
