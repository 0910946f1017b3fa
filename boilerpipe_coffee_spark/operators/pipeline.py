"""Partitioned, resumable batch driver.

North-rule requirement: at 10^12 documents a single job commit is not
viable -- the run must be resumable from the last committed unit with
per-partition lineage + metrics.  Strategy (SURVEY.md section 4):

- documents are routed to ``pmod(xxhash64(doc_id), n_buckets)`` work
  buckets.  On Iceberg the input table is bucketed by doc_id, so the
  per-bucket filter prunes files instead of rescanning; on the parquet
  fallback it is a predicate-pushdown scan.
- each bucket commits atomically: output append + one metrics row
  ``(partition_id, docs_in, docs_out, spans_out, errors, wall_ms,
  extractor)``.  Iceberg gives snapshot atomicity; the parquet fallback
  writes the metrics row last (write-ahead output, commit-marker
  metrics) so a crash mid-bucket re-runs that bucket idempotently
  (output is re-written per-bucket subdirectory, not blind-appended).
- resume = anti-join of bucket ids against the metrics table.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .arrow_extract import extract_arrow as extract


def _done_buckets(spark: SparkSession, metrics_dir: str) -> set[int]:
    try:
        rows = spark.read.parquet(metrics_dir).select("partition_id").collect()
        return {r.partition_id for r in rows}
    except Exception:
        return set()


def run_partitioned(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    extractor: str = "ArticleExtractor",
    n_buckets: int = 64,
) -> dict:
    """Process ``df`` (doc_id, spans) bucket by bucket with resume.

    Returns summary {buckets_run, buckets_skipped, docs_out, errors}.
    """
    data_dir = os.path.join(out_dir, "data")
    metrics_dir = os.path.join(out_dir, "metrics")
    done = _done_buckets(spark, metrics_dir)

    bucketed = df.withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )

    ran = skipped = total_out = total_err = 0
    for b in range(n_buckets):
        if b in done:
            skipped += 1
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        result = extract(part, extractor)
        # per-bucket subdirectory -> idempotent re-run on crash
        result.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"bucket={b}")
        )
        stats = (
            spark.read.parquet(os.path.join(data_dir, f"bucket={b}"))
            .agg(
                F.count("*").alias("docs_out"),
                F.sum(F.size(F.coalesce(F.col("spans"), F.array()))).alias(
                    "spans_out"
                ),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("errors"),
            )
            .collect()[0]
        )
        wall_ms = int((time.time() - t0) * 1000)
        metrics_row = spark.createDataFrame(
            [
                (
                    b,
                    int(stats.docs_out),
                    int(stats.docs_out),
                    int(stats.spans_out or 0),
                    int(stats.errors or 0),
                    wall_ms,
                    extractor,
                )
            ],
            "partition_id int, docs_in long, docs_out long, spans_out long,"
            " errors long, wall_ms long, extractor string",
        )
        metrics_row.write.mode("append").parquet(metrics_dir)
        ran += 1
        total_out += int(stats.docs_out)
        total_err += int(stats.errors or 0)
    return {
        "buckets_run": ran,
        "buckets_skipped": skipped,
        "docs_out": total_out,
        "errors": total_err,
    }


def extract_balanced(
    df: DataFrame,
    extractor: str = "ArticleExtractor",
    giant_chars: int = 200_000,
) -> DataFrame:
    """Skew-aware extraction: giant documents (HTML length above
    ``giant_chars``) are routed to their own round-robin-repartitioned
    pass so each lands on its own task, while the normal population
    flows through the zero-shuffle path untouched.

    The production map has no shuffle, so "skew" means a straggler task
    that happened to pack several giant docs; spreading only the giant
    subset costs a shuffle of that (tiny) subset, never of the corpus.
    The per-doc work stays bounded either way -- this bounds the
    per-TASK work.  (SURVEY.md section 4 'shuffle/skew from giant
    documents'.)
    """
    from .arrow_extract import extract_arrow

    size_expr = F.aggregate(
        F.filter(F.col("spans"), lambda s: s.kind == F.lit("text")),
        F.lit(0),
        lambda acc, s: acc + F.coalesce(F.length(s.text), F.lit(0)),
    )
    sized = df.withColumn("_html_chars", size_expr)
    normal = sized.filter(F.col("_html_chars") <= giant_chars).drop("_html_chars")
    giant = (
        sized.filter(F.col("_html_chars") > giant_chars)
        .drop("_html_chars")
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    return extract_arrow(normal, extractor).unionByName(
        extract_arrow(giant, extractor)
    )
