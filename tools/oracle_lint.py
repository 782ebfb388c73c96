#!/usr/bin/env python3
"""Type-lint every oracle in a dumped oracle_sql.json against DuckDB.

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>

The driver's correctness hash is TYPE-sensitive: DuckDB silently widens
bare sum()/integer-literal arithmetic to HUGEINT (int128), which Spark
cannot emit, so a value-identical result still hash-fails (this killed
d29_pagerank/d30_novelty in round 5). This lint DESCRIBEs each oracle
with the fixture tables registered as views and fails on any output
column whose DuckDB type has no exact Spark analogue.

Run it after any oracle edit:
  python3 tools/oracle_lint.py /root/testdata/sf0.001 <outDir>/oracle_sql.json
"""
import sys, os, json
import duckdb

# DuckDB → Spark-representable result types. Anything outside this set
# (HUGEINT, UHUGEINT, unsigned ints, INTERVAL, ...) will not round-trip
# through the driver's parquet/hash compare.
OK_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BLOB",
}
OK_PREFIXES = ("DECIMAL(", "TIMESTAMP WITH TIME ZONE",
               "VARCHAR[", "BIGINT[", "DOUBLE[", "INTEGER[", "FLOAT[",
               "STRUCT(", "MAP(")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle does not DESCRIBE: {e}")
            n_bad += 1
            continue
        bad = [(c, ty) for c, ty, *_ in cols
               if ty not in OK_TYPES and not ty.startswith(OK_PREFIXES)]
        if bad:
            print(f"FAIL {name}: non-Spark-representable output column(s): "
                  + ", ".join(f"{c} {ty}" for c, ty in bad)
                  + "  (CAST them, e.g. CAST(sum(...) AS BIGINT))")
            n_bad += 1
    print(f"== {len(oracle)} oracles linted, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
