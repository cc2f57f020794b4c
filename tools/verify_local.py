#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the sf
parquet tables and compares with the Spark results dumped by
graft.Verify (one parquet dir per query). Compare is strict: same row
count, same column names (sorted), exact value equality row-by-row
(rows compared in result order — queries are expected to ORDER BY a
unique key; a second unordered compare is reported for diagnosis).

Usage: verify_local.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp"
            ).fetchall() if False else [
                tuple(r[exp.columns.index(c)] for c in exp_cols)
                for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(r[got.columns.index(c)] for c in got_cols)
                        for r in got.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            n_bad += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            n_bad += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got_rows]
        e = [tuple(norm(v) for v in r) for r in exp_rows]
        if g == e:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
        elif sorted(map(repr, g)) == sorted(map(repr, e)):
            print(f"WARN {name}: equal as multisets but row order differs")
            n_ok += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"{diffs[0] if diffs else '(order only)'}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
