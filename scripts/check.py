#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (Spark results) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views over
<sfDir>/*.parquet, and compares: schema (column names), row count, and
values (columns sorted by name, rows sorted, floats to 1e-9 rel tol).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, list):
        return ("l", tuple(norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, norm_cell(x)) for k, x in v.items())))
    return (type(v).__name__, v)

def close(a, b):
    if a == b:
        return True
    if a[0] == "f" and b[0] == "f":
        x, y = a[1], b[1]
        if x is None or y is None:
            return x is y
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
    if a[0] == "l" and b[0] == "l" and len(a[1]) == len(b[1]):
        return all(close(x, y) for x, y in zip(a[1], b[1]))
    return False

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    pylist = tbl.select(cols).to_pylist()
    rows = [tuple(norm_cell(r[c]) for c in cols) for r in pylist]
    return cols, sorted(rows, key=repr)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = n_rowsonly = 0
    # a query that threw inside Verify produces NO output directory — count
    # every oracle-listed (and thus promised) query with no output as a
    # failure instead of silently skipping it
    for missing in sorted(set(oracles) - set(names)):
        print(f"  {missing:<36} MISSING-OUTPUT (query failed in Verify?)")
        n_fail += 1
    for name in names:
        files = [f for f in os.listdir(f"{out_dir}/{name}") if f.endswith(".parquet")]
        got = pq.read_table(f"{out_dir}/{name}")
        if name not in oracles:
            if got.num_rows > 0:
                status = "ROWS-ONLY"
                n_rowsonly += 1
            else:
                status = "EMPTY!"  # a rows-only query with no rows proves nothing
                n_fail += 1
            print(f"  {name:<36} {status} ({got.num_rows} rows)")
            continue
        try:
            exp = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"  {name:<36} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        if gc != ec:
            print(f"  {name:<36} SCHEMA-MISMATCH spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"  {name:<36} ROWCOUNT {len(gr)} vs {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(gr, er)):
            if not all(close(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"  {name:<36} VALUE-MISMATCH row {bad[0]}")
            print(f"    spark: {bad[1]}")
            print(f"    duck : {bad[2]}")
            n_fail += 1
        else:
            print(f"  {name:<36} OK ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
