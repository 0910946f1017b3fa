#!/usr/bin/env python
"""Production job entry point for spark-submit.

    tools/package.sh     # builds dist/boilerpipe_coffee_spark.zip
    spark-submit --py-files dist/boilerpipe_coffee_spark.zip \
        jobs/run_extract.py --input <table-or-path> --output <dir> \
        --extractor ArticleExtractor --buckets 64 [--synth N]

Runs the bucketed, resumable extraction (per-partition commit +
metrics/lineage; restart skips committed buckets).  On a cluster the
session comes from the deploy environment; nothing here assumes local
mode except the default master fallback.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="interleaved-doc table/path")
    ap.add_argument("--input-format", default="parquet",
                    choices=("parquet", "jsonl", "warc"),
                    help="container for --input: parquet table/path "
                         "(default), golden-interchange jsonl, or WARC "
                         "crawl shards (*.warc.gz glob)")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic docs instead of reading --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--extractor", default="ArticleExtractor")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--balanced", action="store_true",
                    help="route giant docs via extract_balanced (use when "
                         "the ingest layout clusters giants)")
    args = ap.parse_args()
    if not args.synth and not args.input:
        ap.error("one of --input or --synth is required")
    known = ("ArticleExtractor", "DefaultExtractor", "LargestContentExtractor",
             "KeepEverythingExtractor", "CanolaExtractor", "Unfiltered")
    if args.extractor not in known:
        print(f"warning: unknown extractor {args.extractor!r}; the "
              "reference semantics fall back to DefaultExtractor")

    spark = (
        SparkSession.builder.appName("bpc-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from boilerpipe_coffee_spark.operators.pipeline import run_partitioned
    from boilerpipe_coffee_spark.sources import read_docs, synth_interleaved

    if args.synth:
        docs = synth_interleaved(spark, args.synth, seed=42)
    else:
        docs = read_docs(spark, args.input, args.input_format)

    summary = run_partitioned(
        spark, docs, args.output, args.extractor, n_buckets=args.buckets,
        balanced=args.balanced,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
