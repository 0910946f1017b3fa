"""Streaming extraction: file-source micro-batches must produce the
same golden output as the batch path, with checkpointed resume."""

import os

from boilerpipe_coffee_spark.sources import INTERLEAVED_SCHEMA
from boilerpipe_coffee_spark.streaming import (
    extract_stream,
    read_interleaved_stream,
    write_stream,
)

from helpers import load_golden


def test_streaming_matches_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    src = os.path.join(base, "in")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    docs = load_golden("t1_docs")[:80]
    rows = [(d["doc_id"], d["spans"]) for d in docs]
    spark.createDataFrame(rows, schema=INTERLEAVED_SCHEMA).repartition(
        4
    ).write.parquet(src)

    stream = read_interleaved_stream(spark, src, max_files_per_trigger=2)
    q = write_stream(extract_stream(stream, "ArticleExtractor"), out, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    expected = {g["doc_id"]: g for g in load_golden("t1_ArticleExtractor")}
    assert len(got) == len(docs)
    for d in docs:
        exp = expected[d["doc_id"]]
        row = got[d["doc_id"]]
        if row.error is not None:
            assert exp["error"] == row.error
            continue
        g_spans = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref,
             "order": s.order}
            for s in (row.spans or [])
        ]
        assert g_spans == exp["spans"] and row.title == exp["title"]

    # resume: nothing new -> no duplicate output
    q2 = write_stream(extract_stream(stream, "ArticleExtractor"), out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(docs)


def test_streaming_extract_spans_equals_batch(spark):
    """The driver-contract streaming extraction query must produce
    EXACTLY the batch extraction's exploded span rows (same corpus,
    same extractor) -- micro-batch boundaries must be invisible."""
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators import extract
    from boilerpipe_coffee_spark.sources import synth_interleaved
    from boilerpipe_coffee_spark.streaming import streaming_extract_spans

    got = [
        tuple(r)
        for r in streaming_extract_spans(
            spark, "/root/testdata/sf0.001", n_docs=80
        ).collect()
    ]
    batch = (
        extract(synth_interleaved(spark, 80, seed=42), "ArticleExtractor")
        .select(
            "doc_id", "title", "error",
            F.posexplode_outer("spans").alias("pos", "s"),
        )
        .select(
            "doc_id", "title", "error",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.order").alias("out_order"),
        )
        .orderBy("doc_id", "out_order")
    )
    expect = [tuple(r) for r in batch.collect()]
    assert got == expect
