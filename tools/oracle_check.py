#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet result written by graft.Verify,
runs <outDir>/oracle_sql.json's SQL in DuckDB over the same sf tables,
and compares: row count, column names, and values (columns sorted by
name, rows sorted by all columns, doubles compared exactly after both
sides round-trip through parquet).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0])

def canon(tbl):
    import pyarrow as pa
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    # normalize to python values, sort rows
    rows = [tuple(round(v, 9) if isinstance(v, float) else v
                  for v in row)
            for row in zip(*[tbl.column(c).to_pylist() for c in cols])]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    n_pass = n_fail = 0
    for name in names:
        spark_tbl = load_result(os.path.join(out_dir, name))
        if spark_tbl is None:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={spark_tbl.num_rows})"); continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, sr = canon(spark_tbl)
        dc, dr = canon(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}"); n_fail += 1; continue
        if sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark: {sr[bad]}")
            print(f"  duck : {dr[bad]}")
            n_fail += 1
            continue
        # Replicate the driver's PANDAS path: the driver hashes pandas
        # values, and DuckDB's pandas bridge coerces HUGEINT (the result
        # type of sum(INTEGER/BIGINT), plain and windowed) and DECIMAL to
        # float64 while Spark parquet yields int64 / Decimal — identical
        # VALUES then hash differently (`5.0` vs `5`). Round 8 lost
        # fn_decimal and round 9 lost five integer-window-sum queries to
        # exactly this, all green under the arrow compare above. Any
        # dtype-KIND divergence between the two pandas views is therefore
        # a driver-level FAIL even though the values are equal.
        sk = {c: spark_tbl.select([c]).to_pandas()[c].dtype.kind for c in sc}
        try:
            dpd = con.execute(oracle[name]).df()
        except Exception:
            dpd = None
        if dpd is not None:
            bad_kinds = {c: (sk[c], dpd[c].dtype.kind) for c in sc
                         if c in dpd.columns and sk[c] != dpd[c].dtype.kind}
            if bad_kinds:
                print(f"FAIL {name}: pandas dtype-kind mismatch {bad_kinds}"
                      f" (cast the oracle's final projection: HUGEINT/DECIMAL -> BIGINT/DOUBLE)")
                n_fail += 1
                continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total results")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
