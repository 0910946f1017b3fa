"""Driver-visible extraction parity: compare Spark extraction output
against the COMMITTED reference truth.

``tests/golden/flagship_spans.parquet`` holds the unmodified
reference's expected output spans for the flagship corpus (the
deterministic ``synth_interleaved`` stream, 300 docs, all five
extractors), produced by ``tools/make_golden.py`` via ``tools/
oracle.js`` running /root/reference/lib/Boilerpipe.js verbatim.

``extract_parity`` runs our extraction on the same corpus and reports
per-extractor multiset-difference counts vs that file.  Its DuckDB
oracle is a trivial aggregate over the SAME committed parquet with
literal-zero mismatch columns -- so the driver's hash comparison goes
red the moment any extractor's (kind, text, media_ref, order, title,
error) output drifts from the reference, making extraction correctness
visible in CORRECTNESS_r{N}.json instead of only in the test suite.

Scale shape: both sides reduce to per-(row-value) counts before the
single null-safe full-outer join (error rows carry null span fields),
so the compare is one shuffle keyed on the row values -- the same
pattern a production output-diff job uses; on a real corpus the golden
side would be a committed sample, not the full output.
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GOLDEN_PATH = str(
    Path(__file__).resolve().parents[2]
    / "tests"
    / "golden"
    / "flagship_spans.parquet"
)

# must match tools/make_golden.py FLAGSHIP_* constants
FLAGSHIP_EXTRACTORS = [
    "ArticleExtractor",
    "DefaultExtractor",
    "LargestContentExtractor",
    "KeepEverythingExtractor",
    "Unfiltered",
]
N_FLAGSHIP_DOCS = 300

_CMP_COLS = [
    "extractor",
    "doc_id",
    "title",
    "error",
    "kind",
    "text",
    "media_ref",
    "out_order",
]


def flagship_spans(spark: SparkSession, extractor: str) -> DataFrame:
    """The flagship corpus through one extractor, exploded to output
    span rows -- the canonical shape shared by the driver's
    ``extract_*_spans`` queries and the parity compare (one definition,
    so they cannot drift)."""
    from ..sources import synth_interleaved
    from . import extract

    docs = synth_interleaved(spark, N_FLAGSHIP_DOCS, seed=42)
    out = extract(docs, extractor)
    return out.select(
        "doc_id",
        "title",
        "error",
        F.posexplode_outer("spans").alias("pos", "s"),
    ).select(
        "doc_id",
        "title",
        "error",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("out_order"),
    )


def extract_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-extractor span parity vs the committed reference golden:
    (extractor, n_docs, n_rows, missing_rows, extra_rows) where the
    mismatch columns are multiset-difference cardinalities (0 = exact
    span-sequence equality with the reference binary)."""
    golden = spark.read.parquet(GOLDEN_PATH).select(_CMP_COLS)
    actual = None
    for ex in FLAGSHIP_EXTRACTORS:
        o = flagship_spans(spark, ex).withColumn("extractor", F.lit(ex))
        actual = o if actual is None else actual.unionByName(o)
    actual = actual.select(_CMP_COLS)

    # multiset compare: reduce each side to value-row counts, then ONE
    # null-safe full-outer join (error rows have null span fields, so a
    # plain equi-join would never match them)
    a_cnt = actual.groupBy(_CMP_COLS).agg(F.count("*").alias("ca"))
    g_cnt = golden.groupBy(_CMP_COLS).agg(F.count("*").alias("cg"))
    cond = reduce(
        lambda x, y: x & y,
        [a_cnt[c].eqNullSafe(g_cnt[c]) for c in _CMP_COLS],
    )
    j = a_cnt.join(g_cnt, cond, "full")
    diff = j.select(
        F.coalesce(a_cnt["extractor"], g_cnt["extractor"]).alias("extractor"),
        F.coalesce(a_cnt["ca"], F.lit(0)).alias("ca"),
        F.coalesce(g_cnt["cg"], F.lit(0)).alias("cg"),
    )
    per = diff.groupBy("extractor").agg(
        F.sum(F.greatest(F.col("cg") - F.col("ca"), F.lit(0)))
        .cast("bigint")
        .alias("missing_rows"),
        F.sum(F.greatest(F.col("ca") - F.col("cg"), F.lit(0)))
        .cast("bigint")
        .alias("extra_rows"),
    )
    stats = golden.groupBy("extractor").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_rows"),
    )
    return (
        stats.join(per, "extractor", "left")
        .select(
            "extractor",
            "n_docs",
            "n_rows",
            F.coalesce("missing_rows", F.lit(0)).cast("bigint").alias(
                "missing_rows"
            ),
            F.coalesce("extra_rows", F.lit(0)).cast("bigint").alias(
                "extra_rows"
            ),
        )
        .orderBy("extractor")
    )


EXTRACT_PARITY_SQL = f"""
SELECT extractor,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_rows,
       0::BIGINT AS missing_rows,
       0::BIGINT AS extra_rows
FROM read_parquet('{GOLDEN_PATH}')
GROUP BY extractor ORDER BY extractor
"""

QUERIES = {"extract_parity": extract_parity}
ORACLES = {"extract_parity": EXTRACT_PARITY_SQL}
