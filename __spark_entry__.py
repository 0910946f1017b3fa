"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction -- deterministic interleaved
  corpus -> ArticleExtractor -> exploded output spans.
- ``queries()``: one entry per implemented operator (SURVEY.md section
  2 inventory + the training-data operators); each takes
  (spark, sf_dir) and returns a DataFrame.
- ``oracle_sql()``: DuckDB twins with identical column names/values
  for every SQL-expressible query.  Extraction itself is not
  SQL-expressible (a SAX parse + stateful filter chain), so the
  ``extract_*`` queries are rows-only; their real correctness gate is
  the golden differential suite in tests/ (exact span-sequence
  equality vs the reference binary, `python -m pytest -x -q`).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ROOT = Path(__file__).resolve().parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))

N_FLAGSHIP_DOCS = 300


def _flagship(spark: SparkSession, extractor: str) -> DataFrame:
    from boilerpipe_coffee_spark.operators.parity import flagship_spans

    return flagship_spans(spark, extractor).orderBy("doc_id", "out_order")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract the synthetic interleaved corpus (rows > 0,
    stable schema).  The sf documents table is also touched (when
    present) so the smoke check exercises the driver parquet path."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs_parquet = Path(sf_dir) / "documents.parquet"
    if docs_parquet.exists():
        spark.read.parquet(str(docs_parquet)).count()
    return _flagship(spark, "ArticleExtractor")


def _extraction_queries() -> dict[str, Callable]:
    def article(spark, sf_dir):
        return _flagship(spark, "ArticleExtractor")

    def default(spark, sf_dir):
        return _flagship(spark, "DefaultExtractor")

    def largest(spark, sf_dir):
        return _flagship(spark, "LargestContentExtractor")

    def keep_everything(spark, sf_dir):
        return _flagship(spark, "KeepEverythingExtractor")

    def staged_article(spark, sf_dir):
        from boilerpipe_coffee_spark.operators import extract_staged
        from boilerpipe_coffee_spark.sources import synth_interleaved

        docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
        out = extract_staged(docs, "ArticleExtractor")
        return (
            out.select(
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

    def media_features(spark, sf_dir):
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.operators.multimodal import (
            decode_features,
            media_payloads,
        )
        from boilerpipe_coffee_spark.sources import synth_interleaved

        docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
        out = extract(docs, "KeepEverythingExtractor")
        return decode_features(media_payloads(out)).orderBy("media_ref").drop(
            "embedding"
        )

    def media_resize(spark, sf_dir):
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.operators.multimodal import (
            media_payloads,
            resize_images,
        )
        from boilerpipe_coffee_spark.sources import synth_interleaved

        docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
        media = media_payloads(extract(docs, "KeepEverythingExtractor"))
        return resize_images(media, max_px=24).drop("payload").orderBy(
            "media_ref"
        )

    def media_frames(spark, sf_dir):
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.operators.multimodal import (
            media_payloads,
            sample_frames,
        )
        from boilerpipe_coffee_spark.sources import synth_interleaved

        docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
        media = media_payloads(extract(docs, "KeepEverythingExtractor"))
        return sample_frames(media, every_ms=500).drop("frame").orderBy(
            "media_ref", "frame_idx"
        )

    def pretrain_pipeline(spark, sf_dir):
        """End-to-end training-data pipeline over the interleaved
        corpus: extract -> content features -> quality + repetition
        gates -> exact-dedup keep flag.  The feature/gate stage is the
        SHARED operator (operators.pretrain.content_features) the
        deployable job (jobs/run_pipeline.py) also runs; rows-only
        check (extraction is not SQL-expressible)."""
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.operators.pretrain import (
            content_features,
        )
        from boilerpipe_coffee_spark.sources import synth_interleaved

        docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
        out = extract(docs, "ArticleExtractor")
        return (
            content_features(out)
            .filter(F.col("passes_gates"))
            .select(
                "doc_id", "title", "n_tokens", "n_media",
                "dup_bigram_frac",
                F.col("is_canonical").alias("keep"),
            )
            .orderBy("doc_id")
        )

    def unfiltered(spark, sf_dir):
        return _flagship(spark, "Unfiltered")

    def warc_ingest(spark, sf_dir):
        """WARC (ISO 28500) ingestion (round 8): fixtures docs
        flattened to HTML, shipped through gzipped WARC shards (the
        Common Crawl record-per-member layout), read + re-split
        distributed, then the SAME extraction pipeline; rows-only
        (binary container pipeline) -- byte-level equality vs the
        direct interleaved path is test-asserted in
        tests/test_warc.py."""
        import os

        from boilerpipe_coffee_spark.fixtures import generate_doc
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.sources.warc import (
            read_warc,
            spans_to_html,
            warc_to_interleaved,
            write_warc,
        )

        wdir = "/tmp/bpc_warc_query_v1"
        if not os.path.exists(os.path.join(wdir, "seg-3.warc.gz")):
            os.makedirs(wdir, exist_ok=True)
            docs = [generate_doc(i, seed=42) for i in range(120)]
            for shard in range(4):
                recs = [
                    (d["doc_id"], spans_to_html(d))
                    for d in docs[shard * 30 : (shard + 1) * 30]
                ]
                with open(
                    os.path.join(wdir, f"seg-{shard}.warc.gz"), "wb"
                ) as f:
                    f.write(write_warc(recs))
        docs = warc_to_interleaved(
            read_warc(spark, os.path.join(wdir, "*.warc.gz"))
        ).filter(F.col("error").isNull())
        out = extract(docs.select("doc_id", "spans"), "ArticleExtractor")
        return (
            out.select(
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

    def pdf_ingest(spark, sf_dir):
        """PDF/layout-parse ingestion (north rule): real text PDFs ->
        interleaved spans -> the SAME extraction pipeline; rows-only
        (binary pipeline), equality vs the HTML path is test-asserted
        in tests/test_pipeline_ops.py."""
        from boilerpipe_coffee_spark.operators import extract
        from boilerpipe_coffee_spark.operators.multimodal import (
            pdf_to_interleaved,
            synth_pdf_corpus,
        )

        pdfs = synth_pdf_corpus(spark, 120, seed=42)
        docs = pdf_to_interleaved(pdfs).filter(F.col("error").isNull())
        out = extract(docs.select("doc_id", "spans"), "ArticleExtractor")
        return (
            out.select(
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

    def warc_hosts(spark, sf_dir):
        """Per-host crawl accounting (round 8 late): fixture docs
        shipped through gzipped WARC shards under real URLs with
        planted REVISITS (the same URL re-crawled), then
        sources.warc.host_stats -- record vs distinct-URL counts per
        host (the fetch-level dedup signal above document dedup).
        Rows-only (binary container pipeline); the deterministic
        counts are pinned in tests/test_warc.py."""
        import os

        from boilerpipe_coffee_spark.fixtures import generate_doc
        from boilerpipe_coffee_spark.sources.warc import (
            host_stats,
            read_warc,
            spans_to_html,
            write_warc,
        )

        wdir = "/tmp/bpc_warc_hosts_v1"
        if not os.path.exists(os.path.join(wdir, "seg-3.warc.gz")):
            os.makedirs(wdir, exist_ok=True)
            docs = [generate_doc(i, seed=43) for i in range(100)]
            recs = [
                (
                    f"https://host{i % 5}.example.com/page/{i}",
                    spans_to_html(d),
                )
                for i, d in enumerate(docs)
            ]
            recs += recs[:20]  # revisits: same URL, same payload
            for shard in range(4):
                with open(
                    os.path.join(wdir, f"seg-{shard}.warc.gz"), "wb"
                ) as f:
                    f.write(write_warc(recs[shard * 30 : (shard + 1) * 30]))
        return host_stats(read_warc(spark, os.path.join(wdir, "*.warc.gz")))

    return {
        "pdf_ingest_extract": pdf_ingest,
        "warc_ingest_extract": warc_ingest,
        "warc_host_stats": warc_hosts,
        "extract_unfiltered_spans": unfiltered,
        "extract_article_spans": article,
        "extract_default_spans": default,
        "extract_largest_spans": largest,
        "extract_keepeverything_spans": keep_everything,
        "extract_article_staged": staged_article,
        "media_decode_features": media_features,
        "media_resize": media_resize,
        "media_frames": media_frames,
        "pretrain_pipeline": pretrain_pipeline,
    }


# The driver materializes CORRECTNESS rows for the FIRST 50 entries of
# queries() dict order (VERDICT r3: the r03 row set == the first 50
# keys; same cap in r02).  There are 56 oracle-backed queries, so the
# contract order is explicit:
#   1. PRIORITY -- the rows whose correctness evidence is most
#      load-bearing (extraction parity vs the reference binary, the
#      four stateful streaming queries, repetition_stats) go first.
#   2. Every other oracle-backed query in module order.
#   3. DEMOTED -- monitoring/baseline rows, each with a strictly
#      stronger sibling already inside the window:
#        emb_bucket_stats       -> dedup_embedding_lsh_pairs
#        minhash_band_stats     -> dedup_minhash_lsh
#        ann_ivf_topk           -> ann_ivf_trained_topk
#        dedup_embedding_cosine -> dedup_embedding_lsh_pairs
#        dedup_ngram_jaccard    -> dedup_minhash_lsh
#        udtf_sentence_explode  -> split_sentences (same explode logic)
#      Round-5 rotation (VERDICT r4 task 4): two more demotions free
#      window slots for the two most load-bearing EXTRA rows
#      (events_salted_agg = skew handling, doc_chunks = chunk
#      materialization, both pipeline-critical):
#        q6_forecast_revenue    -> q1_pricing_summary (same
#                                  filter+aggregate shape over lineitem)
#        min_clause_docs        -> split_sentences (same clause/
#                                  sentence segmentation core)
#      They stay in the contract (and in the full test suite, which
#      parametrizes over ALL oracle keys) but sit past the cap.
#   4. Rows-only extraction/media queries last; their exact-match gate
#      is the golden differential suite + the extract_parity hash row.
PRIORITY = [
    "extract_parity",
    "streaming_windowed_event_counts",
    "streaming_dedup_first_seen",
    "streaming_sessionize",
    "streaming_click_purchase_join",
    "repetition_stats",
]
DEMOTED = [
    "emb_bucket_stats",
    "minhash_band_stats",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "udtf_sentence_explode",
    "q6_forecast_revenue",
    "min_clause_docs",
    # Round-6 rotation (VERDICT r5 task 3): two more demotions free
    # window slots for the two most load-bearing r5 EXTRA rows:
    #   fuse_adjacent_equal      -> the golden-parity extraction family
    #                               (SimpleBlockFusionProcessor is
    #                               covered exactly by extract_parity +
    #                               the golden Default suite)
    #   sessionize_native_window -> sessionize_events (same oracle;
    #                               keep exactly one sessionize twin
    #                               in-window -- the gap-based form is
    #                               the BlockProximityFusion evidence)
    "fuse_adjacent_equal",
    "sessionize_native_window",
    # Round-7 rotation (VERDICT r6 task 3): two more demotions free
    # window slots for the two most load-bearing r6 EXTRA rows
    # (dedup_incremental = recurring-crawl ingest, pii_scrub =
    # compliance).  Both demotions have strictly stronger in-window
    # siblings:
    #   embedding_cosine_topk -> dedup_embedding_lsh_pairs +
    #                            ann_ivf_trained_topk (the brute-force
    #                            all-pairs baseline the scale paths
    #                            are verified against in tests)
    #   ann_lsh_buckets       -> dedup_embedding_lsh_pairs (same
    #                            hyperplane machinery, bucket-level
    #                            output only)
    "embedding_cosine_topk",
    "ann_lsh_buckets",
    # Round-8 rotation (VERDICT r7 task 5): two more demotions free
    # window slots for the two most load-bearing r7 EXTRA rows
    # (dup_span_stats = the substring-level dedup gap between exact
    # hash and MinHash, wired as a pipeline gate;
    # streaming_incremental_dedup = the stream-static join pattern
    # over the shared incremental-dedup oracle).  Both demotions have
    # strictly stronger in-window siblings:
    #   dedup_simhash -> dedup_simhash_pairs (the pairs row exercises
    #                    the same 64-bit signature stage AND the
    #                    chunk-bucket join + cap on top of it)
    #   q17_small_quantity_revenue -> q1_pricing_summary +
    #                    events_percentiles (filter+aggregate and
    #                    per-group-average subquery shapes, both
    #                    in-window)
    "dedup_simhash",
    "q17_small_quantity_revenue",
]
# Promoted into the window (r5: skew handling + chunk
# materialization; r6: the training-sequence packing path and the
# complete dedup hierarchy's verify stage).
PROMOTED = [
    "events_salted_agg",
    "doc_chunks",
    "pack_concat_split",
    "dedup_minhash_verified",
    # r7: the recurring-ingest probe and the compliance scrub
    "dedup_incremental",
    "pii_scrub",
    # r8: the cross-doc dup-span gate and the stream-static
    # incremental-dedup twin
    "dup_span_stats",
    "streaming_incremental_dedup",
]
# Oracle-backed queries added AFTER the r4 window was frozen: they sit
# past the cap (checked by the full test suite, which parametrizes
# over every oracle key) so they cannot displace the 50 in-window rows.
EXTRA = [
    "events_json_props",
    "stratified_sample",
    "simhash_chunk_stats",  # r5 monitoring companion to the chunk cap
    # r8: streaming_incremental_dedup + dup_span_stats promoted into
    # the window (see the round-8 rotation in DEMOTED)
    "dup_span_scrub",  # r8 late: the dup-span REMOVAL transform
    "bigram_pmi",  # r8 late: collocation mining (PMI top-k)
    "source_mixture_sample",  # r8 late: data-mixing rates + pick
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from boilerpipe_coffee_spark.operators import (
        dedup,
        parity,
        relational,
        similarity,
        textstats,
    )

    from boilerpipe_coffee_spark import streaming

    pool: dict[str, Callable] = {}
    pool.update(relational.QUERIES)
    pool.update(dedup.QUERIES)
    pool.update(similarity.QUERIES)
    pool.update(textstats.QUERIES)
    pool.update(streaming.QUERIES)
    pool.update(parity.QUERIES)
    pool.update(_extraction_queries())

    rows_only = set(pool) - set(oracle_sql())
    late = set(DEMOTED) | set(EXTRA)
    out: dict[str, Callable] = {}
    for name in PRIORITY:
        out[name] = pool[name]
    for name, fn in pool.items():
        if name not in out and name not in late and name not in rows_only:
            out[name] = fn
    for name in DEMOTED + EXTRA:
        out[name] = pool[name]
    for name, fn in pool.items():
        if name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from boilerpipe_coffee_spark.operators import (
        dedup,
        parity,
        relational,
        similarity,
        textstats,
    )

    from boilerpipe_coffee_spark import streaming

    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(textstats.ORACLES)
    out.update(streaming.ORACLES)
    # extract_parity: hash-checked extraction correctness -- Spark
    # extraction output is multiset-diffed against the committed golden
    # parquet (reference truth), oracle = aggregate over the same file
    out.update(parity.ORACLES)
    # extract_* and media_decode_features: no SQL oracle (rows-only);
    # their exact-match gate is tests/test_golden.py + test_spark_extract.py
    return out
