#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare to the Spark result parquet
(columns sorted by name, rows as-written). Dev tool only — the Scala
library never depends on this."""
import sys, os, json, glob
import duckdb
import pandas as pd

def main(sf_dir, out_dir, tol1=False):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output"); failures += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); failures += 1; continue
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
        if list(got.columns) != list(want.columns):
            print(f"[SCHEMA] {name}: spark={list(got.columns)} duck={list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(want)}")
            failures += 1; continue
        # compare as strings (hash-like strictness)
        mism = (got.astype(str).values != want.astype(str).values)
        if mism.any() and tol1:
            # store-mode sweep: float aggregates may differ by one
            # fixed-point ulp because the hour-partitioned store changes
            # Spark's accumulation order (values round-trip bit-exactly;
            # the fold order is what moves). Accept |a-b| <= 1 in the
            # quantized value column ONLY; everything else stays exact.
            ok = True
            for r, c in zip(*mism.nonzero()):
                if got.columns[c] != "value":
                    ok = False; break
                try:
                    if abs(int(got.iat[r, c]) - int(want.iat[r, c])) > 1:
                        ok = False; break
                except (TypeError, ValueError):
                    ok = False; break
            if ok:
                print(f"[OK~1] {name}: {len(got)} rows ({mism.sum()} value cells within ±1)")
                continue
        if mism.any():
            idx = list(zip(*mism.nonzero()))[:5]
            print(f"[HASH] {name}: {mism.sum()} cell mismatches, first at {idx}")
            for r, c in idx[:3]:
                print(f"    row {r} col {got.columns[c]}: spark={got.iat[r, c]!r} duck={want.iat[r, c]!r}")
            failures += 1; continue
        print(f"[OK]   {name}: {len(got)} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], tol1="--tol1" in sys.argv[3:])
