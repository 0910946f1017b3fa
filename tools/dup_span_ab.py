"""Persist-vs-recompute A/B for the dup-span gram stage (round 8,
VERDICT r7 "what's wrong" #1).

``dup_span_frac_df``'s Arrow gram stage feeds two consumers (the dup
agg and the island agg); without a persist it runs twice.  This tool
measures both strategies on the 500k rehearsal corpus, interleaved
A/B/A/B in ONE session (the host's +-30% drift rule: never compare
across runs), with forced evaluation via bit_xor(xxhash64) over all
output columns (a bare count lets Catalyst eliminate the final left
join -- the r7 lesson) and a checksum-equality assertion between the
two strategies.

Usage:
    python tools/dup_span_ab.py [--docs 500000] [--passes 3]
        [--base /tmp/scale_lifecycle]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--base", default="/tmp/scale_lifecycle")
    args = ap.parse_args()

    from make_scale_corpus import corpus_current, write_corpus

    corpus = os.path.join(args.base, f"docs{args.docs}")
    if not corpus_current(corpus):
        write_corpus(corpus, args.docs, 100)

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        "--driver-memory 12g --conf spark.sql.shuffle.partitions=128 "
        "--conf spark.cleaner.periodicGC.interval=30s pyspark-shell",
    )
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.textstats import dup_span_frac_df
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(app_name="dup-span-ab")
    docs = spark.read.parquet(
        os.path.join(corpus, "documents.parquet")
    ).select("doc_id", "text")

    def run(persist: bool):
        out = dup_span_frac_df(docs, persist_grams=persist)
        t0 = time.time()
        row = out.agg(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64(doc_id, n_windows, dup_windows, "
                "dup_frac, dup_spans))"
            ).alias("x"),
        ).collect()[0]
        sec = time.time() - t0
        if persist:
            out._dup_span_grams.unpersist()
        return sec, (int(row["n"]), int(row["x"] or 0))

    # warm both paths once (python workers, page cache), then
    # interleave timed passes
    run(False)
    run(True)
    rec: dict = {"docs": args.docs}
    samples = {"recompute": [], "persist": []}
    checks = set()
    for _ in range(args.passes):
        s, c = run(False)
        samples["recompute"].append(round(s, 2))
        checks.add(c)
        s, c = run(True)
        samples["persist"].append(round(s, 2))
        checks.add(c)
    rec["checksums_equal"] = len(checks) == 1
    rec["samples"] = samples
    rec["recompute_median_sec"] = round(
        statistics.median(samples["recompute"]), 2
    )
    rec["persist_median_sec"] = round(
        statistics.median(samples["persist"]), 2
    )
    rec["winner"] = (
        "persist"
        if rec["persist_median_sec"] < rec["recompute_median_sec"]
        else "recompute"
    )
    spark.stop()
    print(json.dumps(rec), flush=True)
    return 0 if rec["checksums_equal"] else 1


if __name__ == "__main__":
    sys.exit(main())
