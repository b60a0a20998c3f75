#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name> subdir (Spark parquet result) in verifyOutDir, runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
tables in sfDir, sorts columns by name, and compares row counts, schemas
(loosely) and values.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def classify(t):
    t = str(t).upper()
    if "HUGEINT" in t:
        return "hugeint"
    if "DECIMAL" in t:
        return "decimal"
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    return "str"

def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            # The DRIVER's comparator sorts rows in pandas, which cannot
            # hash array/struct cells (round-2's q50 failed exactly this
            # way while this replica's DuckDB ORDER BY ALL handled it).
            # Flag nested output types so the slip can't recur.
            nested = [c for c, t in zip(got.columns, got.types)
                      if any(k in str(t).upper() for k in ("[]", "STRUCT", "MAP", "LIST"))]
            if nested:
                print(f"FAIL {name}: nested-typed output columns {nested} "
                      "would crash the driver's pandas row sort")
                n_fail += 1
                continue
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got ORDER BY ALL").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp ORDER BY ALL").fetchall()
            # The DRIVER hashes both sides through pandas, where DuckDB
            # HUGEINT (the type of SUM over BIGINT) renders as float64 —
            # '5531.0' vs Spark's '5531' (round-14's q194 passed here in
            # DuckDB-int land while failing the driver hash exactly this
            # way). Flag HUGEINT oracle columns outright, and any column
            # whose broad dtype class differs between the two sides.
            got_ty = dict(zip(got.columns, got.types))
            exp_ty = dict(zip(exp.columns, exp.types))
            huge = [c for c in exp_cols
                    if classify(exp_ty[c]) in ("hugeint",)]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} are HUGEINT — "
                      "the driver's pandas hash renders them float64; "
                      "CAST the SUM to BIGINT in the oracle SQL")
                n_fail += 1
                continue
            mismatch = [
                (c, str(got_ty[c]), str(exp_ty[c])) for c in got_cols
                if c in exp_ty and classify(got_ty[c]) != classify(exp_ty[c])]
            if mismatch:
                print(f"FAIL {name}: dtype-class mismatch (spark vs oracle) "
                      f"{mismatch} — the driver's pandas hash would differ "
                      "even on equal values")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        g, e = canon(got_rows), canon(exp_rows)
        if g != e:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({len([1 for a,b in zip(g,e) if a!=b])} rows); first: {bad}")
            print(f"     cols: {got_cols}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
