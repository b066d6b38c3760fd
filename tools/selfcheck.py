#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB-oracle compare.

Usage: selfcheck.py <verify_out_dir> <sf_dir> [key ...]

Reads each <out>/<key>/ parquet result (Spark side), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf parquet
tables, sorts columns by name, and compares cell-by-cell (stringified,
with float normalization). Exit 0 iff all match.
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
        # 12 significant digits: catches real mismatches, tolerates
        # last-ulp noise that the rounding rules should have removed
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def fetch_sorted(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [
        tuple(norm_cell(r[i]) for i in order) for r in rows]

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
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"MISSING  {key}: no spark output")
            n_fail += 1
            continue
        try:
            gcols, grows = fetch_sorted(
                con, f"SELECT * FROM read_parquet('{files[0]}')")
            ecols, erows = fetch_sorted(con, sql)
        except Exception as e:
            print(f"ERROR    {key}: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"SCHEMA   {key}: spark={gcols} oracle={ecols}")
            n_fail += 1
        elif len(grows) != len(erows):
            print(f"ROWCOUNT {key}: spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows))
                       if a != b)
            print(f"VALUES   {key}: first diff at row {bad}:")
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
