#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the sfDir tables, sorts columns by name and
rows by all columns, and compares values cell-by-cell.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # strict schema check first (the driver checks schema, not just
            # values): duckdb-visible types of result parquet vs oracle
            got_types = dict(
                (r[0], r[1]) for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
                ).fetchall())
            want_types = dict(
                (r[0], r[1]) for r in con.execute(
                    f"DESCRIBE {sql}").fetchall())
            if got_types != want_types:
                diff = {k: (got_types.get(k), want_types.get(k))
                        for k in set(got_types) | set(want_types)
                        if got_types.get(k) != want_types.get(k)}
                print(f"FAIL {name}: schema mismatch {diff}")
                n_fail += 1
                continue
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            # sort key stringifies so mixed null/non-null numeric columns
            # (int + NaN tuples) stay orderable; the type name rides along
            # so distinct values with equal string forms (int 1 vs '1')
            # order identically on both sides; equality still compares
            # the normalized values themselves
            key = lambda t: tuple((str(v), type(v).__name__) for v in t)
            g = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)], key=key)
            w = sorted([tuple(norm(v) for v in r) for r in want.itertuples(index=False)], key=key)
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} differing rows; first: {bad[0]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
