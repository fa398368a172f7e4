#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the
library): compares each Verify output parquet against DuckDB running
the corresponding oracle SQL on the same testdata tables.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then sort rows; stringify values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        # Materialize BOTH sides via .df() — the driver's own coercion
        # path. fetchall() keeps DuckDB HUGEINT as exact Python ints,
        # which hid the round-8 bug class (sum(BIGINT)→HUGEINT→float64
        # on the driver, exact int locally). .df() reproduces it.
        try:
            duck_df = con.execute(sql).df()
            dcols = list(duck_df.columns)
            drows = [tuple(r) for r in duck_df.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sp_df = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        scols = list(sp_df.columns)
        srows = [tuple(r) for r in sp_df.itertuples(index=False, name=None)]
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1; continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at {i}:\n    spark={x}\n    duck ={y}")
                    break
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
