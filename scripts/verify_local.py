#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify output
against DuckDB oracle SQL on the same parquet tables, compare per query.

Usage: python3 scripts/verify_local.py <sfDir> <outDir>
(Verify must have been run first: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, os, json, glob
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify leaves a durable name -> message record for queries that threw
    err_path = f"{out_dir}/_errors.json"
    spark_errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            why = spark_errors.get(name, "no spark result dir")
            print(f"FAIL {name}: {why}"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # exact value compare, row order as produced; list/array cells
        # (numpy arrays under fetchdf) have no scalar __eq__, so compare
        # their stringified forms
        def same(x, y):
            try:
                return bool(x == y) or str(x) == str(y)
            except (ValueError, TypeError):
                pass
            try:  # array-vs-scalar / array-vs-None mismatches must FAIL, not crash
                return str(list(x)) == str(list(y))
            except (ValueError, TypeError):
                return False
        mism = []
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if not same(x, y):
                    mism.append((c, i, x, y))
                    if len(mism) > 3: break
            if len(mism) > 3: break
        if mism:
            print(f"FAIL {name}: {len(mism)}+ mismatches, first: {mism[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
