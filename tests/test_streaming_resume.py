"""Kill-and-resume for the stateful streaming shapes (VERDICT r4
task 3): drain PART of the backlog with availableNow, let the query
terminate (the controlled stand-in for a crash -- offsets/state are
exactly what a restart sees), restart from the SAME checkpoint dir
with the rest of the data, and assert the final sink equals the batch
answer with no duplicates.  At 100 TB recovery is the feature: this is
the test that the checkpointed state store actually carries windowed /
session state across process boundaries.

Determinism notes:
- watermark delay (40 days) > corpus span, so replay order never drops
  rows as late (same contract as the driver streaming queries);
- watermarks/timeouts act in the batch AFTER the one that advanced
  them, and an availableNow run may terminate right after its last
  data batch -- so the final phase appends a SECOND sentinel slightly
  after the first, guaranteeing one more real batch in which every
  sealed window / timed-out session emits.  Both sentinels' own
  windows stay unflushed (far future) and never reach the sink.
"""

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from boilerpipe_coffee_spark.streaming import (
    _scoped_conf,
    _STREAM_CONFS,
    sessionize_stream,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _run_phase(spark, schema, drops, out, ckpt, transform):
    """One availableNow drain from the shared checkpoint; returns the
    number of offset commits so tests can assert real progress
    happened in each phase."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(drops)
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(glob.glob(os.path.join(ckpt, "offsets", "*")))


def _kill_and_resume(spark, tmp_path, transform, sentinel_user):
    """Shared three-phase scaffold; returns the final sink frame."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    drops = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)

    def sentinel(extra_hours):
        row = (
            int(1 << 62) + extra_hours,
            max_ts + dt.timedelta(days=40, hours=2 + extra_hours),
            sentinel_user, "sentinel", 0.0, None,
        )
        spark.createDataFrame([row], schema=events.schema).coalesce(
            1
        ).write.mode("append").parquet(drops)

    with _scoped_conf(spark, _STREAM_CONFS):
        # phase 1: HALF the backlog, then the query terminates --
        # window/session state for these rows lives only in the
        # checkpointed state store now
        half_a.repartition(4).write.parquet(drops)
        commits1 = _run_phase(spark, events.schema, drops, out, ckpt,
                              transform)
        assert commits1 > 0, "phase 1 made no progress"

        # phase 2: restart from the SAME checkpoint with the rest of
        # the data + the watermark-advancing sentinel
        half_b.repartition(4).write.mode("append").parquet(drops)
        sentinel(0)
        commits2 = _run_phase(spark, events.schema, drops, out, ckpt,
                              transform)
        assert commits2 > commits1, "phase 2 did not resume past phase 1"

        # phase 3: one more restart; the second sentinel guarantees a
        # batch in which the advanced watermark seals everything
        sentinel(1)
        _run_phase(spark, events.schema, drops, out, ckpt, transform)

    return spark.read.parquet(out)


def test_windowed_counts_survive_restart(spark, tmp_path):
    sink = _kill_and_resume(
        spark, tmp_path,
        lambda s: windowed_event_counts(s, watermark_delay="40 days"),
        sentinel_user=0,
    )
    got = sorted(
        tuple(r)
        for r in sink.select(
            "window_start", "event_type", "n_events", "sum_value"
        ).collect()
        if r.event_type != "sentinel"
    )
    assert not sink.filter(F.col("event_type") == "sentinel").count(), (
        "sentinel windows must never flush (they sit at the watermark "
        "frontier)"
    )
    # batch answer: the same aggregate expressed declaratively
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with _scoped_conf(spark, {"spark.sql.session.timeZone": "UTC"}):
        want = sorted(
            tuple(r) for r in windowed_event_counts(events).collect()
        )
    assert len(got) == len(set(got)), "duplicate windows in the sink"
    assert got == want


def test_sessionize_survives_restart(spark, tmp_path):
    sink = _kill_and_resume(
        spark, tmp_path,
        lambda s: sessionize_stream(s, watermark_delay="40 days"),
        sentinel_user=-1,
    )
    got = sorted(
        tuple(r)
        for r in sink.filter(F.col("user_id") >= 0).collect()
    )
    from boilerpipe_coffee_spark.operators.relational import (
        sessionize_events,
    )

    want = sorted(tuple(r) for r in sessionize_events(spark, SF_DIR).collect())
    assert len(got) == len(set(got)), "duplicate sessions in the sink"
    assert got == want


def test_stateful_dedup_survives_restart(spark, tmp_path):
    """applyInPandasWithState dedup (NoTimeout, cumulative emissions):
    state is the running (min doc_id, count) per content hash, so the
    restart must carry phase-1 counts forward -- folding the sink
    reproduces batch dedup_exact only if the recovered state kept
    counting, not restarted from zero."""
    from boilerpipe_coffee_spark.streaming import dedup_first_seen

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    drops = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with _scoped_conf(spark, _STREAM_CONFS):
        docs.filter(F.col("doc_id") % 2 == 0).repartition(3).write.parquet(
            drops
        )
        c1 = _run_phase(spark, docs.schema, drops, out, ckpt,
                        dedup_first_seen)
        assert c1 > 0
        docs.filter(F.col("doc_id") % 2 == 1).repartition(3).write.mode(
            "append"
        ).parquet(drops)
        c2 = _run_phase(spark, docs.schema, drops, out, ckpt,
                        dedup_first_seen)
        assert c2 > c1

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .groupBy("content_hash")
        .agg(
            F.max("n_cum").alias("n_docs"),
            F.min("min_doc_id").alias("keep_doc_id"),
        )
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in docs.groupBy(F.md5("text").alias("content_hash")).agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        ).collect()
    )
    assert got == want


def test_stream_stream_join_survives_restart(spark, tmp_path):
    """Watermarked stream-stream interval join: phase 1 sees only the
    clicks side's early half, so many purchase rows buffer in join
    state; the restart must recover that buffered state to emit the
    cross-phase matches.  Final sink == batch join, no duplicates."""
    from boilerpipe_coffee_spark.streaming import (
        click_purchase_join_stream,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    drops = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def transform(stream):
        return click_purchase_join_stream(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
            watermark_delay="40 days",
        )

    # split so matches CROSS the phases: all purchases land in phase 1
    # (their clicks mostly arrive in phase 2)
    with _scoped_conf(spark, _STREAM_CONFS):
        events.filter(F.col("event_type") == "purchase").repartition(
            2
        ).write.parquet(drops)
        c1 = _run_phase(spark, events.schema, drops, out, ckpt, transform)
        assert c1 > 0
        events.filter(F.col("event_type") != "purchase").repartition(
            4
        ).write.mode("append").parquet(drops)
        c2 = _run_phase(spark, events.schema, drops, out, ckpt, transform)
        assert c2 > c1

    sink = spark.read.parquet(out)
    got = sorted(tuple(r) for r in sink.collect())
    assert len(got) == len(set(got)), "duplicate join rows in the sink"
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    want = sorted(
        tuple(r)
        for r in purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("interval 1 hour"))
            & (F.col("c.ts") <= F.col("p.ts")),
        )
        .select(
            F.col("p.user_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.event_id").alias("click_id"),
            F.unix_timestamp(F.col("p.ts").cast("timestamp")).alias(
                "purchase_epoch"
            ),
            F.unix_timestamp(F.col("c.ts").cast("timestamp")).alias(
                "click_epoch"
            ),
            F.round("p.value", 4).alias("purchase_value"),
        )
        .collect()
    )
    assert got == want


def test_streaming_extraction_survives_restart(spark, tmp_path):
    """The PRODUCTION extraction operator on a file stream (stateless
    mapInArrow): kill-and-resume must be exactly-once purely via the
    file-source offsets -- no doc extracted twice, none lost, spans
    equal the batch extraction."""
    from boilerpipe_coffee_spark.operators.arrow_extract import (
        extract_arrow,
    )
    from boilerpipe_coffee_spark.sources import synth_interleaved
    from boilerpipe_coffee_spark.streaming import read_interleaved_stream

    docs = synth_interleaved(spark, 80, seed=42)
    drops = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def transform(stream):
        return extract_arrow(stream, "ArticleExtractor")

    def phase(schema):
        return _run_phase(
            spark, schema, drops, out, ckpt,
            lambda s: transform(s),
        )

    with _scoped_conf(spark, _STREAM_CONFS):
        docs.filter(F.crc32(F.col("doc_id")) % 2 == 0).repartition(
            3
        ).write.parquet(drops)
        c1 = phase(docs.schema)
        assert c1 > 0
        docs.filter(F.crc32(F.col("doc_id")) % 2 == 1).repartition(
            3
        ).write.mode("append").parquet(drops)
        c2 = phase(docs.schema)
        assert c2 > c1

    def flat(df):
        return sorted(
            (
                r.doc_id, r.title, r.error, r.pos,
                # quarantined docs explode to a null span struct
                *( (r.s.kind, r.s.text, r.s.media_ref, r.s.order)
                   if r.s is not None else (None,) * 4 ),
            )
            for r in df.select(
                "doc_id", "title", "error",
                F.posexplode_outer("spans").alias("pos", "s"),
            ).collect()
        )
    got = flat(spark.read.parquet(out))
    want = flat(extract_arrow(docs, "ArticleExtractor"))
    assert len(got) == len(set(got)), "duplicated spans after restart"
    assert got == want
