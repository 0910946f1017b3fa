"""Partitioned, resumable batch driver.

North-rule requirement: at 10^12 documents a single job commit is not
viable -- the run must be resumable from the last committed unit with
per-partition lineage + metrics.  Strategy (SURVEY.md section 4):

- documents are routed to ``pmod(xxhash64(doc_id), n_buckets)`` work
  buckets; all pending buckets run in ONE scan of the input (the hash
  predicate cannot push down, so per-bucket scans would multiply reads
  by n_buckets) and land via dynamic partition overwrite, one
  ``bucket=N`` directory each.
- commit unit is still the bucket: one metrics row ``(partition_id,
  docs_in, docs_out, spans_out, errors, wall_ms, extractor)`` per
  bucket, written only AFTER its data is fully on disk (write-ahead
  output, commit-marker metrics), one file per bucket.  A crash before
  the metrics append leaves the pending buckets uncommitted and the
  re-run rewrites exactly their directories.
- resume = anti-join of bucket ids against the metrics table.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .arrow_extract import extract_arrow as extract


def _done_buckets(spark: SparkSession, metrics_dir: str) -> set[int]:
    """Committed bucket ids from the metrics table.  ONLY the
    missing-directory case means 'nothing committed yet'; any other
    read failure (e.g. an out_dir written by a pre-hive-layout version
    whose flat metrics files now mix with partition_id=N dirs) RAISES
    instead of being masked as an empty set -- a masked failure would
    silently re-run all buckets and hide the corruption."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(metrics_dir).select("partition_id").collect()
    except AnalysisException as e:
        msg = str(e)
        # 'nothing committed yet' has two shapes: the dir does not
        # exist, OR a crash during the FIRST metrics append left only
        # _temporary/ behind (no readable footer -> schema inference
        # fails).  Both must resume with a full re-run, not raise.
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return set()
        raise RuntimeError(
            f"metrics dir {metrics_dir} exists but is not readable as the "
            "hive-partitioned commit layout (metrics/partition_id=N/): "
            "migrate or remove the legacy/corrupt contents instead of "
            "re-running over them"
        ) from e
    return {r.partition_id for r in rows}


def run_partitioned(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    extractor: str = "ArticleExtractor",
    n_buckets: int = 64,
    balanced: bool = False,
) -> dict:
    """Process ``df`` (doc_id, spans) with bucket-grained resume.

    All PENDING buckets run in a single extraction pass: the input is
    scanned once (not once per bucket -- ``pmod(xxhash64)`` cannot push
    down to a parquet scan, so a per-bucket loop would read a 100 TB
    table 64 times), written ``partitionBy("bucket")`` with DYNAMIC
    partition overwrite so only pending buckets' directories are
    touched, then one metrics row per bucket commits the pass.  Crash
    anywhere before the metrics append leaves every pending bucket
    uncommitted and the re-run rewrites exactly those directories --
    same idempotent write-ahead-output / commit-marker-metrics protocol
    as before, at O(1) input scans.  (On Iceberg the write is a single
    snapshot append instead; the metrics protocol is unchanged.)

    Lineage: ``docs_in`` is counted from the INPUT (one column-pruned
    scan of doc_id), independently of ``docs_out`` from the written
    output, so input/output divergence is detectable.  ``wall_ms`` is
    the wall time of the whole committing pass (buckets no longer run
    serially, so per-bucket wall is not a meaningful quantity).

    ``balanced=True`` routes giant documents through
    :func:`extract_balanced` (see its cost model) -- for ingest layouts
    known to cluster giants.

    Returns summary {buckets_run, buckets_skipped, docs_out, errors}.
    """
    data_dir = os.path.join(out_dir, "data")
    metrics_dir = os.path.join(out_dir, "metrics")
    done = _done_buckets(spark, metrics_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    skipped = n_buckets - len(pending)
    if not pending:
        return {
            "buckets_run": 0,
            "buckets_skipped": skipped,
            "docs_out": 0,
            "errors": 0,
        }

    def with_bucket(frame):
        return frame.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )

    t0 = time.time()
    part = with_bucket(df)
    if len(pending) < n_buckets:
        part = part.filter(F.col("bucket").isin(pending))

    # independent input lineage: column-pruned count per pending bucket
    in_counts = {
        r["bucket"]: r["docs_in"]
        for r in part.select("bucket")
        .groupBy("bucket")
        .agg(F.count("*").alias("docs_in"))
        .collect()
    }

    total_in = sum(in_counts.values())
    if total_in:
        run_extract = extract_balanced if balanced else extract
        result = with_bucket(run_extract(part.drop("bucket"), extractor))
        (
            result.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_dir)
        )
    wall_ms = int((time.time() - t0) * 1000)

    # a fully-empty pending set wrote nothing (partitionBy emits no
    # files for zero rows), so there is nothing to read back -- the
    # pending buckets still commit zero-row metrics markers below
    stats = {} if not total_in else {
        r["bucket"]: r
        for r in spark.read.parquet(data_dir)
        .filter(F.col("bucket").isin(pending))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("docs_out"),
            F.sum(F.size(F.coalesce(F.col("spans"), F.array()))).alias(
                "spans_out"
            ),
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).alias("errors"),
        )
        .collect()
    }

    rows = []
    total_out = total_err = 0
    for b in pending:
        s = stats.get(b)
        docs_out = int(s["docs_out"]) if s else 0
        spans_out = int(s["spans_out"] or 0) if s else 0
        errors = int(s["errors"] or 0) if s else 0
        rows.append(
            (b, int(in_counts.get(b, 0)), docs_out, spans_out, errors,
             wall_ms, extractor)
        )
        total_out += docs_out
        total_err += errors
    # one directory per bucket keeps the commit marker per-bucket
    # deletable/inspectable even though the pass wrote them together
    spark.createDataFrame(
        rows,
        "partition_id int, docs_in long, docs_out long, spans_out long,"
        " errors long, wall_ms long, extractor string",
    ).write.mode("append").partitionBy("partition_id").parquet(metrics_dir)

    return {
        "buckets_run": len(pending),
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

    Cost model (deliberate): the two filter branches evaluate the size
    expression over the input twice = 2x read IO of the two needed
    columns.  The single-scan alternative is a full-corpus repartition
    (1x read + 1x shuffle write + 1x shuffle read + network), which is
    strictly worse for a map-only job; Spark has no multi-output
    operator that could split one scan without caching the corpus.
    Default OFF in run_partitioned -- use when the layout is known to
    cluster giants (measured +49% there, a wash on uniform layouts).
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
