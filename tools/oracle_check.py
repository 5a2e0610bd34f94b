#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, loads the Spark parquet result
from <verifyOutDir>/<name>/, sorts columns by name (driver behavior),
and compares row-for-row. Dev tool only — the real gate is driver-side.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v): vals.append("NaN")
                else: vals.append(f"{v:.9g}")
            else: vals.append(str(v))
        out.append(tuple(vals))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(sorted(files))
        scols = tbl.column_names
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1; continue
        order = sorted(scols)
        srows = list(zip(*[tbl.column(c).to_pylist() for c in order]))
        didx = [dcols.index(c) for c in order]
        drows2 = [tuple(r[i] for i in didx) for r in drows]
        a, b = normalize(srows), normalize(drows2)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff @row {i} cols={order}\n   spark={x}\n   duck ={y}")
                    break
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
