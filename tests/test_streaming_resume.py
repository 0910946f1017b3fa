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
