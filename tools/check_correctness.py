"""Local replica of the driver's t2 correctness gate.

Runs every ``__ray_entry__.queries()`` entry at sf0.01 next to its
``oracle_sql()`` DuckDB equivalent and compares row count, schema
(sorted column names) and a value hash (rows sorted, floats rounded),
timing each query.  Used as the round's feedback loop so the real
driver gate can never ship empty again.

Usage:  python tools/check_correctness.py [--sf-dir DIR] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    payload = df.to_csv(index=False, float_format="%.4f").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--json-out", default="/tmp/correctness_local.json")
    args = ap.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    t_import = time.perf_counter()
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"[import+registry {time.perf_counter() - t_import:.2f}s] "
          f"{len(qs)} queries, {len(oracles)} oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    only = set(args.only.split(",")) if args.only else None
    results: dict[str, dict] = {}
    t_suite = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        row: dict = {}
        try:
            got = to_pandas(fn(args.sf_dir))
            row["ray_rows"] = len(got)
            row["ray_cols"] = sorted(got.columns)
            if name in oracles:
                exp = con.execute(oracles[name]).df()
                row["oracle_rows"] = len(exp)
                row["rows_match"] = len(got) == len(exp)
                row["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                row["hash_match"] = value_hash(got) == value_hash(exp)
                row["ok"] = bool(
                    row["rows_match"] and row["schema_match"] and row["hash_match"]
                )
            else:
                row["ok"] = len(got) >= 0  # rows-only check
                row["rows_only"] = True
        except Exception as e:
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        row["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        status = "OK " if row.get("ok") else "FAIL"
        kind = "rows-only" if row.get("rows_only") else "oracle"
        print(f"{status} {name:32s} {row['sec']:7.2f}s  [{kind}]"
              + ("" if row.get("ok") else f"  {json.dumps({k: v for k, v in row.items() if k not in ('ok', 'sec')}, default=str)[:300]}"))

    total = time.perf_counter() - t_suite
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    n_oracle = sum(1 for r in results.values() if not r.get("rows_only"))
    print(f"\n{n_ok}/{len(results)} ok ({n_oracle} oracle-checked), "
          f"suite {total:.1f}s")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print("slowest:", ", ".join(f"{k}={v['sec']}s" for k, v in slow))
    with open(args.json_out, "w") as f:
        json.dump({"results": results, "total_sec": total}, f, indent=1, default=str)
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
