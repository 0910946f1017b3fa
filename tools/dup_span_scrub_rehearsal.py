"""Scale rehearsal for dup_span_scrub_df (the --scrub-dup-spans
pipeline stage) at 500k docs: wall-clock for the byte-preserving
splice, plus the self-consistency checks no small test can give:

1. AFFECTED-SET equality: the set of docs with removed_tokens > 0
   must equal the set dup_span_frac_df reports with dup_windows > 0
   (both derive from the same duplicated-gram marking; a wiring bug
   in either path breaks the equality).
2. RESIDUAL duplication after one scrub pass: re-running
   dup_span_frac_df over the SCRUBBED text must find (near-)zero
   duplicated windows -- the splice removed every covered token from
   every doc, so only windows newly CREATED by the splice (kept
   tokens becoming adjacent across a cut) can remain.  The residual
   count is reported, not asserted to zero: splice-created grams are
   legitimate output, just expected to be orders of magnitude below
   the input duplication.

Evaluation is forced via bit_xor(xxhash64(*)) over all output columns
(the r7 lesson: a bare count() lets Catalyst eliminate provably-
unique joins and fake the timing).

Usage:
    python tools/dup_span_scrub_rehearsal.py [--docs 500000] \
        [--corpus /tmp/scale_scrub] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _checksum(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + "))"
        ).alias("x")
    ).collect()[0]["x"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--corpus", default="/tmp/scale_scrub")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    sf_dir = os.path.join(args.corpus, f"d{args.docs}")
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scale_corpus.py"),
                "--out", sf_dir, "--docs", str(args.docs),
                "--vecs", "100",
            ],
            check=True,
        )

    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.textstats import (
        dup_span_frac_df,
        dup_span_scrub_df,
    )
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(
        "dup-span-scrub-rehearsal", master=f"local[{args.cpus}]"
    )
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")

    out = {"docs": args.docs, "cpus": args.cpus}

    t0 = time.time()
    scrubbed = dup_span_scrub_df(docs, normal_form=False)
    scrubbed.persist()
    out["scrub_checksum"] = _checksum(scrubbed)
    out["scrub_sec"] = round(time.time() - t0, 1)
    out["docs_per_sec"] = round(args.docs / out["scrub_sec"])

    row = scrubbed.agg(
        F.sum((F.col("removed_tokens") > 0).cast("int")).alias("d"),
        F.sum("removed_tokens").alias("rm"),
        F.sum("n_tokens").alias("nt"),
    ).collect()[0]
    out["affected_docs"] = int(row["d"])
    out["removed_tokens"] = int(row["rm"])
    out["total_tokens"] = int(row["nt"])

    # check 1: affected set == the stats op's dup_windows > 0 set
    t0 = time.time()
    stats = dup_span_frac_df(docs)
    mismatch = (
        scrubbed.select(
            "doc_id", (F.col("removed_tokens") > 0).alias("a")
        )
        .join(
            stats.select("doc_id", (F.col("dup_windows") > 0).alias("b")),
            "doc_id",
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    out["affected_set_mismatches"] = mismatch
    out["stats_pass_sec"] = round(time.time() - t0, 1)

    # check 2: residual duplication over the SCRUBBED text
    t0 = time.time()
    residual = (
        dup_span_frac_df(
            scrubbed.select("doc_id", F.col("scrubbed_text").alias("text"))
        )
        .agg(F.sum("dup_windows").alias("w"))
        .collect()[0]["w"]
    )
    out["residual_dup_windows"] = int(residual or 0)
    out["residual_pass_sec"] = round(time.time() - t0, 1)
    scrubbed.unpersist()

    print(json.dumps(out))
    if mismatch:
        raise SystemExit(f"AFFECTED-SET MISMATCH: {mismatch} docs")


if __name__ == "__main__":
    main()
