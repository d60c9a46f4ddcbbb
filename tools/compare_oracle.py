#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Reads each Verify output parquet and the dumped oracle_sql.json, runs the
oracle SQL in DuckDB with views over the same sf-dir parquet tables, then
compares: column names (sorted), row counts, and cell values (rows sorted,
values canonicalized). Mirrors the driver's t2 gate closely enough to catch
mismatches before a round lands.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got_rel.description]
            grows = got_rel.fetchall()
            exp_rel = con.execute(sql)
            ecols = [d[0] for d in exp_rel.description]
            erows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failed.append(name)
            continue
        gc, gr = frame(grows, gcols)
        ec, er = frame(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failed.append(name); continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            failed.append(name); continue
        if gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  cols:  {gc}")
            print(f"  spark: {gr[bad]}")
            print(f"  duck:  {er[bad]}")
            failed.append(name); continue
        print(f"OK   {name}: {len(gr)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
