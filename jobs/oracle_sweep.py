#!/usr/bin/env python
"""Registry-wide Spark-vs-DuckDB oracle sweep — the driver's correctness
gate as a local tool, so every key has builder-run evidence at ANY scale
before the real driver samples its 50-key window.

    python jobs/oracle_sweep.py                          # all keys, sf0.01
    python jobs/oracle_sweep.py --sf /root/testdata/sf0.1
    python jobs/oracle_sweep.py --keys funnel_chain,retention

Per key it runs the registry query on Spark and the oracle SQL on DuckDB
over the same parquet directory, then compares the driver's way: row
count, column-name set, and an order-insensitive VALUE HASH over the
column-name-sorted, row-sorted canonical frame. The hash is exact — no
float tolerance — which is deliberately stricter than
tests/test_entry_contract.py: a key that passes here is bitwise
reproducible across engines, the bar the round docs call "bitwise".

Canonicalization mirrors the driver: columns sorted by name, timestamps
to epoch-microseconds int64, bytes hex-encoded, arrays rendered through
repr of Python lists, NULL as a fixed sentinel, rows sorted by the
canonical string tuple, then one sha256 over the whole frame.

Exit code: number of failing keys (0 = sweep green). One JSON line per
key on stdout; summary line last.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_NULL = "\x01<NULL>"


def _cell(v) -> str:
    if v is None:
        return _NULL
    if isinstance(v, float):
        if v != v:  # NaN — DuckDB NULL floats surface as NaN via .df()
            return _NULL
        # repr(float) is the shortest round-trip form in both engines'
        # pandas bridges; exact binary equality is the contract
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in list(v)) + "]"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return _cell(float(v))
    if isinstance(v, (np.bool_, bool)):
        return "true" if v else "false"
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            vals = pd.to_datetime(df[c]).astype("datetime64[us]").astype("Int64")
            df[c] = vals.map(lambda x: _NULL if pd.isna(x) else str(int(x)))
        else:
            df[c] = [_cell(v) if not (v is None or (isinstance(v, float) and v != v) or v is pd.NA) else _NULL for v in df[c]]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(b"\x00")
    for row in df.itertuples(index=False):
        for v in row:
            h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default="", help="comma-separated subset")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from tgist_features_spark import get_spark

    spark = get_spark(master=args.master) if args.master else get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    keys = [k for k in args.keys.split(",") if k] or list(queries)
    unknown = [k for k in keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return len(unknown)

    fails = 0
    for name in keys:
        t0 = time.time()
        rec: dict = {"key": name}
        try:
            got = queries[name](spark, args.sf).toPandas()
            rec["rows"] = len(got)
            if name not in oracles:
                rec["oracle"] = "none"
                rec["ok"] = bool(len(got) > 0)
            else:
                ref = con.sql(oracles[name]).df()
                a, b = canonicalize(got), canonicalize(ref)
                rec["rows_match"] = len(a) == len(b)
                rec["schema_match"] = list(a.columns) == list(b.columns)
                ha, hb = value_hash(a), value_hash(b)
                rec["hash_match"] = ha == hb
                rec["ok"] = bool(
                    rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                )
                if not rec["ok"] and rec["rows_match"] and rec["schema_match"]:
                    neq = (a != b).any(axis=1)
                    idx = list(a.index[neq][:2])
                    rec["first_diff"] = [
                        {"spark": a.loc[i].to_dict(), "oracle": b.loc[i].to_dict()}
                        for i in idx
                    ]
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            rec["ok"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["wall_s"] = round(time.time() - t0, 2)
        if not rec["ok"]:
            fails += 1
        print(json.dumps(rec), flush=True)

    print(json.dumps({"swept": len(keys), "failed": fails, "sf": args.sf}))
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
