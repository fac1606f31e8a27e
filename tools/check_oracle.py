#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name> parquet dir (Spark output) and the
dumped oracle_sql.json, runs each oracle against the sf-dir tables in
DuckDB, and compares: row count, column names (sorted), and a hash of
all values (rows sorted by all columns, columns sorted by name).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to strings for robust compare
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return list(df.columns), len(rows), hash(tuple(rows)), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            scols, scnt, shash, srows = canon(con, f"SELECT * FROM '{spark_dir}/*.parquet'")
            ocols, ocnt, ohash, orows = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            n_fail += 1
        elif scnt != ocnt:
            print(f"FAIL {name}: rows spark={scnt} oracle={ocnt}")
            n_fail += 1
        elif shash != ohash:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({scnt} rows)")
            n_pass += 1
    # queries without oracle → rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0] if files else 0
            print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
