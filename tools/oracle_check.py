#!/usr/bin/env python3
"""Dev-loop twin of the driver's DuckDB correctness compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [namePrefix,...]

Mimics the driver's gate closely enough to catch its failure modes
before a round ends:
  - loads each <out>/<name> parquet (Spark result) and runs the
    matching SQL from <out>/oracle_sql.json in DuckDB over the sfDir
    tables;
  - brings BOTH sides through pandas (so DuckDB HUGEINT -> float64
    dtype bombs surface here, exactly as they do driver-side);
  - sorts columns by name, sorts rows by all columns, compares the
    string rendering of every cell.
"""
import os, sys, json, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cells(df, sort_rows):
    # sort_rows=False keeps OUTPUT order (single-part Spark parquet +
    # DuckDB both preserve query order), so a dropped/broken final
    # ORDER BY fails here like it would driver-side; the sorted form
    # is only used to distinguish "order-only" from value mismatches
    df = df[sorted(df.columns)]
    if sort_rows:
        df = df.sort_values(list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return [[render(v) for v in row] for row in df.itertuples(index=False)], df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # ORACLE_CHECK_SET="preserve_insertion_order=false;memory_limit='24GB'"
    # — session settings for heavy legs (d14's unrolled-Lloyd oracle
    # spills >60 GB at GenData SFs with insertion order preserved)
    for kv in filter(None, os.environ.get("ORACLE_CHECK_SET", "").split(";")):
        con.execute(f"SET {kv}")
    for t in TABLES:
        # driver testdata tables are single parquet FILES; GenData
        # ladder tables are multi-part DIRECTORIES — accept both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle_sql.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        # sorted: glob order is filesystem-dependent; part-00000..N must
        # concatenate in write order for the order-sensitive compare
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"{name:32s} MISSING spark output")
            bad += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({parts!r})").fetchdf()
        oracle = con.execute(sql).fetchdf()
        s_cells, s_df = cells(spark, sort_rows=False)
        o_cells, o_df = cells(oracle, sort_rows=False)
        schema_ok = sorted(spark.columns) == sorted(oracle.columns)
        rows_ok = len(spark) == len(oracle)
        hash_ok = s_cells == o_cells
        if schema_ok and rows_ok and hash_ok:
            print(f"{name:32s} OK     rows={len(spark)}")
        else:
            bad += 1
            order_only = (schema_ok and rows_ok and
                          cells(spark, True)[0] == cells(oracle, True)[0])
            print(f"{name:32s} FAIL   schema={schema_ok} rows={rows_ok} "
                  f"({len(spark)}/{len(oracle)}) hash={hash_ok}"
                  + ("  [ORDER-ONLY mismatch]" if order_only else ""))
            if schema_ok and rows_ok:
                shown = 0
                for i, (a, b) in enumerate(zip(s_cells, o_cells)):
                    if a != b and shown < 3:
                        print(f"   row {i}: spark={a}")
                        print(f"   row {i}: duck ={b}")
                        shown += 1
                print(f"   spark dtypes: {dict(s_df.dtypes.astype(str))}")
                print(f"   duck  dtypes: {dict(o_df.dtypes.astype(str))}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
