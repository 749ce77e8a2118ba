#!/usr/bin/env python3
"""Oracle dtype lint: run every oracleSql through DuckDB and flag any
result column whose declared type the driver's hasher would render
differently than Spark's.

Usage: python3 tools/oracle_dtype_lint.py <sfDir> <oracleSqlJson>

Why this exists (round-11 verdict): DuckDB's sum(BIGINT) returns
HUGEINT (int128), which pandas materializes as float64, while Spark
returns int64 — rows and schema match but the driver's
representation-sensitive hash differs. p7_lakehouse_corpus hid exactly
this for two rounds because tools/check.py compares NUMERICALLY. The
repo convention is to CAST every top-level aggregate; this lint
enforces it by checking the ACTUAL DuckDB result dtypes, not the SQL
text.

Flagged classes:
  * HUGEINT / UHUGEINT  (pandas → float64/object; Spark never emits)
  * DECIMAL(p,s)        (pandas → object/Decimal; Spark would be double)
  * UINTEGER/UBIGINT    (unsigned; Spark has no unsigned types)

Runs with LIMIT 0 via DESCRIBE so even quadratic oracles lint in
milliseconds at any SF.
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT",
       "USMALLINT", "UTINYINT")


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        f = f"{sf_dir}/{t}.parquet"
        if os.path.exists(f):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(oracle_json))
    fails = 0
    for name in sorted(oracle):
        try:
            # DESCRIBE resolves the full result type without executing
            desc = con.sql(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle does not parse: {e}")
            fails += 1
            continue
        for col, typ, *_ in desc:
            base = typ.upper()
            if any(base.startswith(b) for b in BAD):
                print(f"FAIL {name}: column '{col}' is {typ} — cast it "
                      f"(Spark will emit int64/double; the driver hash "
                      f"is representation-sensitive)")
                fails += 1
    print(f"{'LINT FAIL' if fails else 'LINT PASS'}: "
          f"{len(oracle)} oracles, {fails} flagged columns")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
