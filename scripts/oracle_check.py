#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each
graft.Verify parquet output against the DuckDB oracle SQL run on the same
scale-factor tables. Columns sorted by name, rows sorted by all columns,
values compared exactly (floats: exact, since queries are engineered to be
deterministic across engines).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        problems = []
        if list(exp.columns) != list(got.columns):
            problems.append(f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
        elif len(exp) != len(got):
            problems.append(f"row count: oracle={len(exp)} spark={len(got)}")
        else:
            sexp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            sgot = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            for c in exp.columns:
                ev, gv = sexp[c], sgot[c]
                if str(ev.dtype) != str(gv.dtype):
                    problems.append(f"dtype {c}: oracle={ev.dtype} spark={gv.dtype}")
                neq = ~((ev == gv) | (ev.isna() & gv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"value {c} row {i}: oracle={ev[i]!r} spark={gv[i]!r} "
                        f"({int(neq.sum())} diffs)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
