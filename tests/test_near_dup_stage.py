"""Stage-4 near-dup keeper selection (pretrain.near_dup_keep): the
production dedup hierarchy exact -> LSH -> components, end to end over
a planted corpus exercising every keep/drop path."""

from pyspark.sql import functions as F

from boilerpipe_coffee_spark.operators.pretrain import (
    content_features,
    near_dup_keep,
)
from boilerpipe_coffee_spark.sources import OUTPUT_SCHEMA

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
    "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one "
    "two three four five six seven eight nine ten eleven twelve "
)
# disjoint vocabulary so the exact-twin pair is NOT a near-dup of BASE
BASE2 = (
    "granite basalt marble slate quartz feldspar mica gneiss schist "
    "obsidian pumice shale limestone dolomite chalk flint gypsum "
    "anthracite lignite peat copper iron zinc nickel cobalt tin "
    "silver gold platinum mercury lead bismuth antimony arsenic "
)


def _doc(doc_id, text):
    return (
        doc_id,
        "t",
        [{"kind": "text", "text": text, "media_ref": None, "order": 0}],
        None,
    )


def test_near_dup_keepers(spark):
    rows = [
        _doc("doc-a1", BASE + "ending alpha variant"),
        _doc("doc-a2", BASE + "ending beta variant"),  # near-dup of a1
        # singleton: varied words (a repeated phrase would trip the
        # dup-bigram repetition gate)
        _doc(
            "doc-b",
            "the harbor held forty small sailing boats whose crews "
            "traded stories about winds tides charts anchors ropes "
            "sails masts rudders compasses lanterns and long journeys "
            "across cold northern waters every autumn season",
        ),
        _doc("doc-c1", BASE2 + "exact twin tail"),
        _doc("doc-c2", BASE2 + "exact twin tail"),     # exact dup of c1
        _doc("doc-d", "too short"),                    # fails gates
    ]
    extracted = spark.createDataFrame(rows, OUTPUT_SCHEMA)
    out = near_dup_keep(content_features(extracted))
    got = {
        r.doc_id: (r.keep, r.cluster_id, r.keep_final) for r in out.collect()
    }
    # exact stage: c2 is non-canonical; gates: d fails
    assert got["doc-c2"][0] is False and got["doc-c2"][2] is False
    assert got["doc-d"][0] is False and got["doc-d"][2] is False
    # near-dup cluster a1~a2: min doc_id wins
    assert got["doc-a1"] == (True, "doc-a1", True)
    assert got["doc-a2"] == (True, "doc-a1", False)
    # survivors without near-dups keep themselves
    assert got["doc-b"] == (True, "doc-b", True)
    assert got["doc-c1"] == (True, "doc-c1", True)
    # rows that never entered the stage have null cluster_id
    assert got["doc-c2"][1] is None and got["doc-d"][1] is None


def test_near_dup_keep_final_subset_of_keep(spark):
    """On the organic flagship corpus keep_final implies keep and the
    cluster keeper is the cluster minimum."""
    from boilerpipe_coffee_spark.operators import extract
    from boilerpipe_coffee_spark.sources import synth_interleaved

    docs = synth_interleaved(spark, 120, seed=42)
    out = near_dup_keep(content_features(extract(docs, "ArticleExtractor")))
    bad = out.filter(F.col("keep_final") & ~F.col("keep")).count()
    assert bad == 0
    mins = (
        out.filter(F.col("keep"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"), F.sum(F.col("keep_final").cast("int")).alias("k"))
    )
    rowz = mins.collect()
    assert all(r.k == 1 and r.mn == r.cluster_id for r in rowz)
