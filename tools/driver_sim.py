"""Simulate the round driver's CORRECTNESS pass in a vanilla session.

Runs the FIRST 50 entries of ``__spark_entry__.queries()`` in dict
order (the driver's materialization window) against a fresh
``local[$SPARK_GRAFT_CPUS]`` SparkSession, compares each to its DuckDB
``oracle_sql()`` twin at sf0.01 (row count, sorted column names,
order-insensitive value hash with floats rounded), and prints one JSON
line per query plus a summary.  Usage::

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--limit 50]
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import math
import os
import sys
import time
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", str(Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _norm_cell(v):
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", round(v, 4))
    if isinstance(v, int):
        return ("int", v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return ("dt", s[:10] if s.endswith("T00:00:00") else s)
    return (type(v).__name__, str(v))


def _value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(
        [tuple(_norm_cell(r[i]) for i in order) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )
    h = hashlib.sha256()
    for row in norm:
        h.update(repr(row).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    entry = _entry_mod()
    q = entry.queries()
    oracles = entry.oracle_sql()
    names = list(q.keys())[: args.limit]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_ok = n_bad = 0
    for name in names:
        rec = {"name": name}
        t0 = time.time()
        try:
            sdf = q[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                pdf = con.sql(oracles[name]).df()
                d_cols = list(pdf.columns)
                d_rows = [
                    tuple(x.item() if hasattr(x, "item") else x for x in row)
                    for row in pdf.itertuples(index=False, name=None)
                ]
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _value_hash(s_cols, s_rows) == _value_hash(d_cols, d_rows)
                )
                ok = rec["hash_match"]
            else:
                rec["rows_only"] = True
                ok = len(s_rows) >= 0
            rec["err"] = None
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            ok = False
        rec["sec"] = round(time.time() - t0, 2)
        n_ok += ok
        n_bad += not ok
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary": {"ok": n_ok, "bad": n_bad, "n": len(names)}}))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
