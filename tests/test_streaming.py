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
