#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Reads each Verify output parquet and the dumped oracle_sql.json, runs the
oracle SQL in DuckDB with views over the same sf-dir parquet tables, then
compares: column names (sorted), row counts, and cell values (rows sorted,
values canonicalized). Mirrors the driver's t2 gate closely enough to catch
mismatches before a round lands.

Beyond values, compares column DTYPES: the driver's hash is typed, so a
value-identical result with BIGINT on the Spark side and HUGEINT on the
DuckDB side (bare sum(CASE) over INTEGER) hash-mismatches there while the
canonicalized-value compare here stays silent. Both sides are DESCRIBEd in
DuckDB so the names are apples-to-apples; a small equivalence map absorbs
the benign reader differences (timestamp tz-ness), everything else FAILs.

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

def norm_type(t):
    # Spark writes timestamps as tz-adjusted micros; DuckDB reads them as
    # TIMESTAMP WITH TIME ZONE while its own SQL yields plain TIMESTAMP.
    # Same instant either way — not the hazard class this check hunts.
    return t.replace(" WITH TIME ZONE", "")

def dtypes(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: norm_type(r[1]) for r in rows}

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
            got_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got_rel = con.execute(got_sql)
            gcols = [d[0] for d in got_rel.description]
            grows = got_rel.fetchall()
            exp_rel = con.execute(sql)
            ecols = [d[0] for d in exp_rel.description]
            erows = exp_rel.fetchall()
            gtypes = dtypes(con, got_sql)
            etypes = dtypes(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failed.append(name)
            continue
        gc, gr = frame(grows, gcols)
        ec, er = frame(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failed.append(name); continue
        drift = [(c, gtypes.get(c), etypes.get(c))
                 for c in gc if gtypes.get(c) != etypes.get(c)]
        if drift:
            print(f"FAIL {name}: dtype drift (spark vs duckdb): " +
                  ", ".join(f"{c} {g} != {e}" for c, g, e in drift))
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
