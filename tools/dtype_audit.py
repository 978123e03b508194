#!/usr/bin/env python3
"""Oracle portability audit: for each query, compare the DuckDB
oracle's output column dtypes against the Spark result's parquet
schema. Flags HUGEINT/DECIMAL oracle columns (rendered differently by
newer DuckDB versions) and any dtype-class mismatch (int vs float vs
str) — the exact failure mode that made q_moving_avg hash-fail in
round 4 while rows+schema still matched.

Usage: python3 tools/dtype_audit.py <sf_dir> <verify_out_dir>
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def klass(t):
    t = str(t).upper()
    if any(x in t for x in ("HUGEINT", "INT128", "DECIMAL")):
        return "bigdec"
    if "INT" in t:
        return "int"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if any(x in t for x in ("VARCHAR", "STRING", "UTF8")):
        return "str"
    if "BOOL" in t:
        return "bool"
    if "TIMESTAMP" in t:
        return "ts"
    if "DATE" in t:
        return "date"
    if "LIST" in t or "[]" in t:
        return "list"
    return t


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            o_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        try:
            p = f"{out}/{name}"
            if not os.path.exists(p):
                p = f"{out}/{name}.parquet"
            if os.path.isdir(p):
                parts = sorted(glob.glob(f"{p}/part-*.parquet"))
                if not parts:
                    print(f"NO-SPARK {name}: empty dir")
                    continue
                p = parts[0]
            schema = pq.read_schema(p)
        except Exception as e:
            print(f"NO-SPARK {name}: {e}")
            continue
        s_types = {f.name: str(f.type) for f in schema}
        for c, ot in o_types.items():
            ok = klass(ot)
            if ok == "bigdec":
                print(f"FLAG {name}.{c}: oracle {ot} (version-variant rendering)")
                bad += 1
                continue
            if c not in s_types:
                print(f"FLAG {name}.{c}: missing in spark schema "
                      f"(spark has {sorted(s_types)})")
                bad += 1
                continue
            sk = klass(s_types[c])
            if ok != sk:
                print(f"FLAG {name}.{c}: oracle {ot} [{ok}] vs spark "
                      f"{s_types[c]} [{sk}]")
                bad += 1
    print(f"{'CLEAN' if bad == 0 else 'ISSUES'}: {bad} flags over "
          f"{len(oracles)} oracles")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
