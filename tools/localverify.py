#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/localverify.py <verify_out_dir> <sf_dir>

Loads oracle_sql.json from the verify output dir, runs each SQL in DuckDB
against views over the sf parquet tables, and compares against the Spark
parquet dump: column-name set, row count, and value equality with rows
sorted by all columns (mirrors the driver's sort-columns-by-name + hash).
Exact equality for all types (the Exact decimal trick should make doubles
bit-identical); reports first few diffs otherwise.
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ: spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows differ: spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        # dtype gate mirroring the driver's hash: int widths normalize,
        # but int-vs-float does NOT (DuckDB HUGEINT -> pandas float64 is
        # the classic escape: SUM(BIGINT)/list_sum in an EMITTED column).
        # Values can be equal while the driver's hash mismatches.
        kind_diffs = []
        for c in ocols:
            ok, sk = odf[c].dtype.kind, sdf[c].dtype.kind
            norm = lambda k: "i" if k in "iu" else k
            if {norm(ok), norm(sk)} == {"i", "f"}:
                kind_diffs.append((c, str(odf[c].dtype), str(sdf[c].dtype)))
        if kind_diffs:
            print(f"FAIL {name}: int-vs-float dtype (col,oracle,spark): {kind_diffs}"
                  " — CAST the oracle column (HUGEINT trap)")
            n_fail += 1
            continue
        o = odf[ocols].sort_values(ocols).reset_index(drop=True)
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        diffs = []
        for c in ocols:
            for i, (a, b) in enumerate(zip(o[c], s[c])):
                eq = (a == b) or (a is None and b is None)
                try:
                    if not eq and isinstance(a, float) and isinstance(b, float):
                        eq = (math.isnan(a) and math.isnan(b)) or a == b
                except Exception:
                    pass
                try:
                    import pandas as pd
                    if not eq and pd.isna(a) and pd.isna(b):
                        eq = True
                except Exception:
                    pass
                if not eq:
                    diffs.append((c, i, a, b))
                    if len(diffs) >= 3:
                        break
            if len(diffs) >= 3:
                break
        if diffs:
            print(f"FAIL {name}: value diffs (col,row,oracle,spark): {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
