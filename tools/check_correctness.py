"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and, when an ``oracle_sql()`` entry
exists, the DuckDB oracle on the same parquet tables; compares row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted by their stringified tuple).  Prints one line per query.

Usage: PYTHONPATH=. python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        parts = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("<NULL>")
            elif isinstance(v, float):
                parts.append(repr(v))
            else:
                parts.append(str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict = {}

    import logging

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name:24s} ray error: {type(e).__name__}: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(
                f"rows  {name:24s} rows={len(ray_df):7d} cols={sorted(ray_df.columns)}"
                f" ({wall:.1f}s, rows-only)"
            )
            report[name] = {"rows_match": True, "schema_match": None,
                            "hash_match": None, "spark_rows": len(ray_df),
                            "oracle_rows": None, "err": None,
                            "note": "rows-only (no oracle_sql entry)"}
            n_pass += 1
            continue
        try:
            ora_df = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name:24s} oracle error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"oracle: {e}"}
            n_fail += 1
            continue
        ok_rows = len(ray_df) == len(ora_df)
        ok_cols = sorted(ray_df.columns) == sorted(ora_df.columns)
        ok_hash = ok_cols and value_hash(ray_df) == value_hash(ora_df)
        report[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                        "hash_match": ok_hash, "spark_rows": len(ray_df),
                        "oracle_rows": len(ora_df), "err": None}
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS  {name:24s} rows={len(ray_df):7d} ({wall:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL  {name:24s} rows {len(ray_df)} vs {len(ora_df)}; "
                f"cols ray={sorted(ray_df.columns)} ora={sorted(ora_df.columns)}; "
                f"hash_match={ok_hash}"
            )
            if ok_cols and ok_rows:
                merged_cols = sorted(ray_df.columns)
                a = ray_df[merged_cols].astype(str).apply("\x1f".join, axis=1)
                b = ora_df[merged_cols].astype(str).apply("\x1f".join, axis=1)
                only_ray = set(a) - set(b)
                only_ora = set(b) - set(a)
                for x in list(only_ray)[:3]:
                    print("   ray-only:", x[:160])
                for x in list(only_ora)[:3]:
                    print("   ora-only:", x[:160])
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(report, fh, indent=1)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
