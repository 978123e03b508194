#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each <outDir>/<name> parquet against the
DuckDB result of <outDir>/oracle_sql.json on the same sf tables.
Columns are sorted by name, rows sorted by all columns, values
compared with exact match (floats: exact after both engines' rounding).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return duckdb.query(f"SELECT * FROM read_parquet({files!r})").df()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # union of produced outputs AND declared oracles: a query that
    # crashed inside graft.Verify (caught + logged, no output dir)
    # must count as FAIL, not silently vanish from the gate
    dirs = set(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
    names = sorted(dirs | set(oracle.keys()))
    n_pass = n_fail = 0
    for name in names:
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle, rows-only)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        a = spark_df.reindex(sorted(spark_df.columns), axis=1)
        b = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        try:
            # normalize dtypes: compare as python objects via string repr of values
            mismatch = None
            for c in a.columns:
                av, bv = a[c].tolist(), b[c].tolist()
                for i, (x, y) in enumerate(zip(av, bv)):
                    if pd.isna(x) and pd.isna(y):
                        continue
                    if isinstance(x, float) or isinstance(y, float):
                        if float(x) != float(y):
                            mismatch = (c, i, x, y); break
                    elif str(x) != str(y):
                        mismatch = (c, i, x, y); break
                if mismatch:
                    break
            if mismatch:
                c, i, x, y = mismatch
                print(f"FAIL {name}: value mismatch col={c} row={i}: spark={x!r} duck={y!r}")
                n_fail += 1
            else:
                print(f"PASS {name}: rows={len(a)}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
