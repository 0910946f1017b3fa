"""Structured Streaming wrapper around the extraction operator.

The north rule's pipeline is batch with Iceberg-snapshot resume
(operators.pipeline), but the same per-document operator composes
directly with Structured Streaming for continuous ingestion: the
production extract is a stateless mapInArrow over independent rows, so
it needs no watermarks or state store -- each micro-batch is extracted
exactly like a batch partition, and checkpointing gives exactly-once
sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import extract
from ..sources import INTERLEAVED_SCHEMA


def read_interleaved_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of interleaved-doc parquet drops."""
    return (
        spark.readStream.schema(INTERLEAVED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def extract_stream(
    docs: DataFrame,
    extractor: str = "ArticleExtractor",
):
    """Streaming extraction: same operator, stateless per row."""
    return extract(docs, extractor)


def write_stream(
    result: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Parquet sink with checkpoint; availableNow processes the backlog
    then stops (the streaming analogue of the batch resume loop)."""
    writer = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
