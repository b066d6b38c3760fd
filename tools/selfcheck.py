#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB-oracle compare.

Usage: selfcheck.py <verify_out_dir> <sf_dir> [key ...]

Reads each <out>/<key>/ parquet result (Spark side, ALL part files),
runs the matching oracle SQL from <out>/oracle_sql.json in DuckDB,
sorts columns by name, and compares as a sorted multiset of stringified
rows (the driver re-sorts rows in pandas, so row order must not
matter). Two checks beyond plain value equality, both of which bit the
round-1 gate:
  * KIND  — pandas dtype kind per column must match (DuckDB HUGEINT /
            ceil/floor come back float64 while Spark writes int64; the
            driver hashes the pandas repr, so "438" != "438.0").
  * ARRAY — list/ndarray cells crash the driver's sort_values
            (unhashable numpy.ndarray); flag them before the driver does.
Exit 0 iff all match.
"""
import sys, json, glob, math

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: the driver hashes full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def fetch_sorted(con, sql):
    """(sorted cols, row multiset sorted by stringified tuple, dtype kinds)."""
    df = con.execute(sql).df()
    cols = sorted(df.columns)
    df = df[cols]
    kinds = [df[c].dtype.kind for c in cols]
    arraycols = [c for c in cols
                 if df[c].dtype.kind == "O" and len(df) > 0
                 and any(isinstance(x, (list, tuple)) or
                         type(x).__name__ == "ndarray"
                         for x in df[c].head(5))]
    rows = sorted(
        tuple(norm_cell(v) for v in rec)
        for rec in df.itertuples(index=False, name=None))
    return cols, rows, kinds, arraycols

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_skip = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"MISSING  {key}: no spark output")
            n_fail += 1
            continue
        flist = "[" + ",".join(f"'{f}'" for f in files) + "]"
        try:
            gcols, grows, gkinds, garr = fetch_sorted(
                con, f"SELECT * FROM read_parquet({flist})")
            ecols, erows, ekinds, earr = fetch_sorted(con, sql)
        except Exception as e:
            print(f"ERROR    {key}: {e}")
            n_fail += 1
            continue
        if garr or earr:
            print(f"ARRAY    {key}: array-typed cells would crash the "
                  f"driver compare: spark={garr} oracle={earr}")
            n_fail += 1
        elif gcols != ecols:
            print(f"SCHEMA   {key}: spark={gcols} oracle={ecols}")
            n_fail += 1
        elif gkinds != ekinds:
            bad = [(c, a, b) for c, a, b in zip(gcols, gkinds, ekinds)
                   if a != b]
            print(f"KIND     {key}: dtype-kind mismatch (col, spark, "
                  f"oracle): {bad}")
            n_fail += 1
        elif len(grows) != len(erows):
            print(f"ROWCOUNT {key}: spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows))
                       if a != b)
            print(f"VALUES   {key}: first diff at sorted row {bad}:")
            print(f"  spark : {grows[bad]}")
            print(f"  oracle: {erows[bad]}")
            n_fail += 1
        else:
            print(f"ok       {key} ({len(grows)} rows)")
            n_pass += 1
    # queries without an oracle entry: rows-only check
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        key = p.rstrip("/").split("/")[-1]
        if key not in oracle:
            n_skip += 1
            print(f"no-oracle {key}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)

main()
