#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB with the
fixture tables registered as views, sort columns by name, and compare
schemas/row-order values exactly (doubles compared exactly — the
engine is expected to make them deterministic).
"""
import sys, os, json, glob, re
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(set(oracle) - dirs):
        print(f"FAIL {name}: declared oracle but no output dir (query failed?)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        # dtype mismatch is a FAIL, not a WARN: the driver's hash is
        # type-sensitive (DuckDB HUGEINT widening killed d29/d30 in r5
        # and s43/s44 in r9 with value-identical results), so the local
        # gate must be at least as strict. Timestamp unit spellings
        # (datetime64[us] vs [ns]) are normalized first — parquet writers
        # legitimately differ there and the driver compares values.
        def norm(dt):
            # normalize the storage UNIT only (datetime64[us] ==
            # datetime64[ns]); a timezone suffix stays significant —
            # tz-aware vs naive is a real mismatch (and would TypeError
            # in the value loop below if let through)
            s = str(dt)
            m = re.match(r"datetime64\[\w+(?:, *(.+))?\]$", s)
            if m:
                return "datetime64[%s]" % (m.group(1) or "")
            return s
        dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                       for c in got.columns
                       if norm(got[c].dtype) != norm(exp[c].dtype)]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and not (x is None and y is None) and str(x) != str(y):
                    mismatch = (c, i, x, y); break
            if mismatch: break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
