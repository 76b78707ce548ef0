"""Emulate the grading driver: run every oracled query and diff vs DuckDB with dtypes."""
import sys, os, glob, traceback

sys.path.insert(0, "/root/repo")
import ray
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional second arg: comma-separated query names for a focused run
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)

import __ray_entry__ as E

con = duckdb.connect()
for p in glob.glob(os.path.join(SF, "*.parquet")):
    name = os.path.splitext(os.path.basename(p))[0]
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

qs = E.queries()
oracles = E.oracle_sql()


def to_df(res):
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    return res


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


fails = []
for name, sql in sorted(oracles.items()):
    if ONLY is not None and name not in ONLY:
        continue
    try:
        ray_df = canon(to_df(qs[name](SF)))
        ora_df = canon(con.sql(sql).df())
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append(f"rows {len(ray_df)} vs {len(ora_df)}")
        if list(ray_df.columns) != list(ora_df.columns):
            problems.append(f"cols {list(ray_df.columns)} vs {list(ora_df.columns)}")
        else:
            for c in ray_df.columns:
                if str(ray_df[c].dtype) != str(ora_df[c].dtype):
                    problems.append(f"dtype[{c}] {ray_df[c].dtype} vs {ora_df[c].dtype}")
            if not problems:
                for c in ray_df.columns:
                    a, b = ray_df[c], ora_df[c]
                    if np.issubdtype(a.dtype, np.floating):
                        ok = np.allclose(a.fillna(0), b.fillna(0), rtol=1e-9, atol=1e-12) and (a.isna() == b.isna()).all()
                    else:
                        ok = a.equals(b)
                    if not ok:
                        problems.append(f"values[{c}] differ")
        if problems:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(ray_df)} rows)")
    except Exception:
        fails.append(name)
        print(f"ERROR {name}")
        traceback.print_exc()

no_oracle = sorted(set(qs) - set(oracles))
n_checked = len(oracles) if ONLY is None else len(ONLY & set(oracles))
if ONLY is not None:
    no_oracle = [n for n in no_oracle if n in ONLY]
print(f"\noracled: {n_checked}  pass: {n_checked-len(fails)}  fail: {len(fails)}")
print(f"rows-only (no oracle): {no_oracle}")
for name in no_oracle:
    try:
        res = to_df(qs[name](SF))
        print(f"ROWS {name}: {len(res)}")
    except Exception:
        print(f"ERROR(rows-only) {name}")
        traceback.print_exc()

ray.shutdown()
sys.exit(1 if fails else 0)
