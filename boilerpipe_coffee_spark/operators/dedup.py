"""Deduplication operators for large-scale training-data pipelines.

Four families, each as a (Spark DataFrame, DuckDB oracle SQL) pair over
the ``documents`` table; all hashing is md5-derived so both engines
compute bit-identical values:

- exact dedup: hash-groupBy on md5(text), keep min doc_id.
- n-gram Jaccard: token 3-gram shingles, exact pairwise similarity via
  a shingle-equality self-join (intersection counts) -- the
  correctness baseline the sketch methods approximate.
- MinHash + LSH: b*r signatures over shingle hashes in b bands of r
  (adaptive via :func:`minhash_banding`; <=1000 docs = the legacy 8
  signatures, 4 bands of 2); band-equality buckets yield candidate
  pairs without the N^2 join -- the 100 TB-scale path (shuffle keyed
  on band values, skew-safe since signatures are uniform).
- SimHash: 32-bit sign-sketch of the token set; near-dup candidates
  have small Hamming distance.

Scale note: at 10^12 docs the Jaccard self-join is infeasible (its
shingle join explodes); minhash bands keep the shuffle linear in corpus
size, and the band join is a narrow (band_key -> [doc_id]) exchange.
That hierarchy (exact -> LSH candidates -> verify) is the intended
production composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# md5-hex prefix -> bigint, identical in Spark and DuckDB
# Spark:  conv(substring(md5(x), 1, 15), 16, 10)::bigint
# DuckDB: ('0x' || substring(md5(x), 1, 15))::BIGINT
_P = 2147483647  # 2^31-1, keeps a*h+b within 63 bits (a < 2^16 -> a*h < 2^47)
# Affine minhash coefficients.  The FIRST 8 are the legacy family --
# unchanged bit-for-bit so every committed corpus row stays stable;
# entries 8..31 extend the family for the adaptive widths below.
_MINHASH_AB = [
    (387, 10283),
    (1021, 74099),
    (2667, 33223),
    (4093, 91121),
    (5749, 55313),
    (7919, 20201),
    (9241, 68207),
    (10369, 41911),
    (11587, 30293),
    (12721, 83231),
    (13687, 57529),
    (14879, 12097),
    (16063, 77573),
    (17299, 41039),
    (18523, 90821),
    (19709, 25763),
    (20921, 64601),
    (22093, 18341),
    (23279, 87119),
    (24473, 52561),
    (25667, 9973),
    (26861, 73009),
    (28057, 36493),
    (29251, 98519),
    (30449, 21067),
    (31643, 69427),
    (32839, 44699),
    (34031, 15083),
    (35227, 80329),
    (36433, 58111),
    (37633, 27803),
    (38833, 91457),
]
N_BANDS = 4  # legacy banding: 8 signatures, 4 bands of 2

# Adaptive MinHash width (round 6, mirroring similarity.emb_banding):
# as the corpus grows, background pairs start colliding in 2-row
# bands (per-band collision prob s^r, and candidate volume scales with
# N * collisions-per-doc), so rows-per-band r gains one row per 10x
# growth past the legacy floor and bands b = 4 + 2*(r-2) spend part of
# the precision win on recall.  Every committed corpus (<= 1000 docs)
# resolves to the legacy (4, 2) = 8 signatures, so driver/suite rows
# are bit-stable; sf0.1 (5000 docs) resolves to (6, 3) and the sf1
# rehearsal corpus (50k) to (8, 4).  Oracle CTEs take the same n_rows
# and derive (b, r) through THIS function, so the two sides cannot
# drift -- non-legacy corpora must regenerate their SQL via
# ``_minhash_pairs_ctes(n_rows=...)`` (the exported ORACLES strings
# are the legacy instance).
MINHASH_LEGACY_N = 1000


def minhash_banding(n_docs: int) -> "tuple[int, int]":
    """(bands b, rows-per-band r) for a corpus of ``n_docs``:
    r = min(4, 2 + ceil(log10(N/1000))) past the legacy floor,
    b = 4 + 2*(r-2); signature width k = b*r (8/18/32)."""
    import math

    extra = 0
    if n_docs > MINHASH_LEGACY_N:
        extra = math.ceil(math.log10(n_docs / MINHASH_LEGACY_N))
    r = min(4, 2 + extra)
    b = 4 + 2 * (r - 2)
    return b, r


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Driver-table reader; ``spread=True`` applies the conditional
    scan-parallelism floor (see :mod:`.scanspread`) for the
    compute-heavy signature/shingle stages, which a single-row-group
    test table would otherwise serialize on one core."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if spread:
        from .scanspread import spread_scan

        df = spread_scan(spark, df, path)
    return df


from ..functions import h64 as _h64  # noqa: E402  (shared cross-engine hash)


from ..functions import TOKENS as _TOKENS
from ..functions import TOKENS_DUCK as _TOKENS_DUCK
from ..functions import h64_duck as _h64_duck
from ..functions import shingles_duck as _mk_shingles_duck

_SHINGLES_DUCK = _mk_shingles_duck(3)

# band-bucket skew cap, shared by the Spark operator AND the DuckDB
# oracle CTEs so capped semantics stay value-identical; non-default
# caps therefore diverge from oracle_sql() and are for ad-hoc use only
BUCKET_CAP = 64


# ------------------------------------------------------------------ #


def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("content_hash")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, count(*) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text) ORDER BY content_hash
"""


# ------------------------------------------------------------------ #


def dedup_ngram_jaccard(spark, sf_dir, threshold: float = 0.5):
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_TOKENS).alias("toks"))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN size(toks) >= 3 THEN "
                "transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', slice(toks, i, 3))) "
                "ELSE array() END"
            ).alias("shingles"),
        )
    )
    sets = docs.select(
        "doc_id", F.array_distinct("shingles").alias("shingles")
    ).withColumn("set_size", F.size("shingles"))
    ex = sets.select(
        "doc_id", "set_size", F.explode("shingles").alias("shingle")
    )
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jacc = F.round(
        F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 4
    )
    return (
        pairs.select("doc_a", "doc_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_SQL = f"""
WITH sets AS (
  SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS shingles
  FROM documents WHERE len({_TOKENS_DUCK}) >= 3
), sized AS (
  SELECT doc_id, shingles, len(shingles) AS set_size FROM sets
), ex AS (
  SELECT doc_id, set_size, unnest(shingles) AS shingle FROM sized
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.set_size AS size_a, b.set_size AS size_b,
         count(*) AS inter
  FROM ex a JOIN ex b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(inter / (size_a + size_b - inter), 4) AS jaccard
FROM pairs
WHERE round(inter / (size_a + size_b - inter), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------ #


def minhash_candidate_pairs(
    docs: DataFrame,
    bucket_cap: int = BUCKET_CAP,
    banding: "tuple[int, int] | None" = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs over ANY (doc_id,
    text) frame, UNSORTED -- consumers that don't need presentation
    order (cluster resolution, the pipeline job's near-dup stage) use
    this directly and skip the global sort.

    Banding resolves through :func:`minhash_banding`: pass ``n_docs``
    when the caller already knows the corpus size (the pipeline job
    counts survivors for its summary anyway -- no extra pass), else
    one ``docs.count()`` derives it (a parquet-footer metadata count
    on plain scans).  An explicit ``banding`` tuple overrides both."""
    from pyspark.sql import Window

    if banding is None:
        if n_docs is None:
            n_docs = docs.count()
        banding = minhash_banding(n_docs)
    stacked = minhash_bands_df(docs, banding)
    # bucket size via a window on band_key: ONE shuffle of the band
    # rows.  Above the barrier_pays crossover the capped frame is
    # materialized once per invocation (eager localCheckpoint): both
    # aliases of the self-join consume it, and without the barrier
    # EACH side re-runs the Arrow signature pass over the whole
    # corpus (2 corpus passes + 2 band shuffles -> 1, guide §8: the
    # band table is the lightweight proxy — (doc_id, band_key) rows,
    # b per doc — never the corpus text).  localCheckpoint, not
    # persist: the CacheManager matches persisted plans across
    # invocations, which would turn a re-run into a silent cache
    # read.
    bucket_n = F.count("*").over(Window.partitionBy("band_key"))
    capped = (
        stacked.withColumn("bucket_n", bucket_n)
        .filter(F.col("bucket_n") <= bucket_cap)
        .select("doc_id", "band_key")
    )
    from .scanspread import barrier_pays

    if barrier_pays(n_docs if n_docs is not None else 0):
        # the re-spread after the checkpoint restores full
        # parallelism for the in-bucket pair join (the checkpointed
        # frame keeps the window's AQE-coalesced ~1-partition
        # layout) at the cost of one tiny proxy shuffle, which the
        # band-keyed join then reuses.  Below the barrier_pays
        # crossover the un-materialized self-join (two cheap
        # pipelined passes) is faster — measured both ways.
        capped = capped.localCheckpoint().repartition(
            docs.sparkSession.sparkContext.defaultParallelism,
            "band_key",
        )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _minhash_pairs(spark, sf_dir, bucket_cap: int = BUCKET_CAP):
    # corpus size from the UN-spread scan (parquet-footer metadata
    # count); the spread frame's count() would execute the repartition
    n_docs = _t(spark, sf_dir, "documents").count()
    return minhash_candidate_pairs(
        _t(spark, sf_dir, "documents", spread=True),
        bucket_cap,
        n_docs=n_docs,
    )


def dedup_minhash_lsh(spark, sf_dir, bucket_cap: int = BUCKET_CAP):
    """MinHash signatures + banded LSH candidate pairs.

    Skew guard: a band bucket holding B docs emits B^2/2 pairs, so a
    flood of identical boilerplate (millions of copies of one page)
    would turn the band join quadratic.  Buckets larger than
    ``bucket_cap`` are dropped from the candidate join -- membership in
    a flood bucket means near-exact duplication, which the exact-dedup
    pass (hash groupBy, linear) already resolves; the LSH pass exists
    for the long tail of NEAR duplicates.  The DuckDB oracle applies
    the SAME cap (shared ``BUCKET_CAP`` constant in its CTEs), so the
    parity invariant holds even on flood corpora;
    ``minhash_band_stats`` reports dropped buckets for monitoring.
    """
    return _minhash_pairs(spark, sf_dir, bucket_cap).orderBy(
        "doc_a", "doc_b"
    )


def _doc_id_sql_type(df: DataFrame) -> str:
    """Output-schema type for doc_id in the vectorized signature
    stages.  Only string/int/bigint are supported -- anything else
    (decimal, struct, ...) must be rejected loudly rather than
    silently mis-declared as bigint in the mapInPandas schema."""
    dt = dict(df.dtypes)["doc_id"]
    if dt == "string":
        return "string"
    if dt in ("int", "bigint", "smallint", "tinyint"):
        return "bigint"
    raise TypeError(
        f"unsupported doc_id dtype {dt!r} for the signature stage "
        "(expected string or an integer type)"
    )


def minhash_sigs_df(docs_in: DataFrame, n_sig: int = 8) -> DataFrame:
    """(doc_id, text) -> (doc_id, mh0..mh{n_sig-1}): the minhash
    signatures (default: the legacy 8), computed in ONE map-side
    Arrow pass.

    Why not the declarative form (tokenize/shingle HOFs + explode +
    8-min groupBy)?  Measured at sf0.1: the Catalyst higher-order
    functions (split/transform/slice/concat_ws/array_distinct) are
    interpreted per element -- the skeleton costs ~4 s even with the
    hashing replaced by min(length(s)), i.e. the HOFs dominate, and
    the exploded shingle STRINGS then shuffle to the aggregate.  This
    pass emits one 8-int row per document: no shingle materialization
    JVM-side, no corpus-sized string shuffle, and the signature stage
    becomes embarrassingly parallel.  Values are bit-identical to the
    DuckDB oracle CTEs (md5 hex prefix -> int64; exact integer affine
    mins; tokenizer is the shared ASCII [^a-z0-9]+ class, same as
    TOKENS/TOKENS_DUCK)."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    if n_sig > len(_MINHASH_AB):
        raise ValueError(
            f"n_sig={n_sig} exceeds the {len(_MINHASH_AB)}-entry "
            "coefficient family"
        )
    ab = _MINHASH_AB[:n_sig]
    coeff_a = np.array([a for a, _ in ab], dtype=np.int64)[:, None]
    coeff_b = np.array([b for _, b in ab], dtype=np.int64)[:, None]
    tok_re = re.compile(r"[^a-z0-9]+")

    def sig_fn(batches):
        # r9: per-task shingle-hash memo (the _gram_rows_df rationale:
        # cross-doc shingle repetition measured 38x at sf1.0; bounded
        # clear-on-overflow) + digest-slice md5 (first 15 hex chars ==
        # first-8-bytes int >> 4, no hex round trip)
        md5 = hashlib.md5
        ifb = int.from_bytes
        memo: dict = {}

        def h60p(s):
            h = memo.get(s)
            if h is None:
                h = (ifb(md5(s.encode()).digest()[:8], "big") >> 4) % _P
                if len(memo) >= 1 << 20:
                    memo.clear()
                memo[s] = h
            return h

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in tok_re.split((text or "").lower()) if t]
                if len(toks) < 3:
                    continue
                shingles = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
                hs = np.fromiter(
                    (h60p(s) for s in shingles),
                    dtype=np.int64,
                    count=len(shingles),
                )
                # a*h+b < 2^45: exact in int64, identical to JVM pmod
                sigs.append(((coeff_a * hs + coeff_b) % _P).min(axis=1))
                ids.append(doc_id)
            out = {"doc_id": ids}
            for i in range(n_sig):
                out[f"mh{i}"] = [s[i] for s in sigs]
            yield pd.DataFrame(out)

    schema = "doc_id " + _doc_id_sql_type(docs_in) + "".join(
        f", mh{i} bigint" for i in range(n_sig)
    )
    return docs_in.select("doc_id", "text").mapInPandas(sig_fn, schema)


def minhash_bands_df(
    docs_in: DataFrame, banding: "tuple[int, int]" = (N_BANDS, 2)
) -> DataFrame:
    """(doc_id, text) -> (doc_id, band_key) rows: b*r minhash
    signatures in b bands of r (default: the legacy 4 bands of 2).
    Band j's key concatenates the band index with signatures
    mh[j*r .. j*r+r-1] -- for r=2 this reproduces the legacy key
    strings byte-for-byte."""
    b, r = banding
    sig = minhash_sigs_df(docs_in, b * r)
    bands = sig.select(
        "doc_id",
        *[
            F.concat_ws(
                "-",
                F.lit(str(j)),
                *[F.col(f"mh{j * r + i}") for i in range(r)],
            ).alias(f"band{j}")
            for j in range(b)
        ],
    )
    return bands.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{j}") for j in range(b)])).alias(
            "band_key"
        ),
    )


def minhash_band_stats(spark, sf_dir, bucket_cap: int = BUCKET_CAP):
    """Monitoring companion to the skew guard: bucket-size histogram
    plus how many buckets/docs the cap would drop."""
    docs = _t(spark, sf_dir, "documents")
    counts = minhash_bands_df(
        docs, minhash_banding(docs.count())
    ).groupBy("band_key").agg(
        F.count("*").alias("bucket_n")
    )
    return counts.agg(
        F.count("*").alias("n_buckets"),
        F.max("bucket_n").alias("max_bucket"),
        F.sum(F.when(F.col("bucket_n") > bucket_cap, 1).otherwise(0)).alias(
            "buckets_dropped"
        ),
        F.sum(
            F.when(F.col("bucket_n") > bucket_cap, F.col("bucket_n")).otherwise(0)
        ).alias("docs_in_dropped"),
    )


def _minhash_pairs_ctes(n_rows: int | None = None) -> str:
    """CTE list ending in ``lsh_pairs(doc_a, doc_b)`` -- shared by the
    candidate-pair oracle, the verified oracle, and the
    cluster-resolution oracle.  ``n_rows`` resolves the banding
    through the SAME :func:`minhash_banding` the Spark side uses
    (None -> legacy 4x2, the exported-ORACLES instance; every
    committed corpus is <= MINHASH_LEGACY_N docs so it resolves
    identically)."""
    b_bands, r_rows = (
        minhash_banding(n_rows) if n_rows is not None else (N_BANDS, 2)
    )
    k = b_bands * r_rows
    mh_exprs = ",\n         ".join(
        f"min(({a} * h + {b}) % {_P}) AS mh{i}"
        for i, (a, b) in enumerate(_MINHASH_AB[:k])
    )
    band_exprs = ", ".join(
        f"'{j}' || '-' || "
        + " || '-' || ".join(f"mh{j * r_rows + i}" for i in range(r_rows))
        + f" AS band{j}"
        for j in range(b_bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, band{j} AS band_key FROM bands"
        for j in range(b_bands)
    )
    return f"""ex AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_DUCK})) AS sh
  FROM documents WHERE len({_TOKENS_DUCK}) >= 3
), hs AS (
  SELECT doc_id, ({_h64_duck('sh')}) % {_P} AS h
  FROM ex
), sig AS (
  SELECT doc_id,
         {mh_exprs}
  FROM hs GROUP BY doc_id
), bands AS (
  SELECT doc_id, {band_exprs} FROM sig
), stacked AS (
  {band_union}
), capped AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bucket_n
    FROM stacked)
  WHERE bucket_n <= {BUCKET_CAP}
), lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""


def _minhash_lsh_sql(n_rows: int | None = None) -> str:
    return f"""
WITH {_minhash_pairs_ctes(n_rows)}
SELECT doc_a, doc_b FROM lsh_pairs ORDER BY doc_a, doc_b
"""


def _minhash_band_stats_sql(n_rows: int | None = None) -> str:
    return f"""
WITH {_minhash_pairs_ctes(n_rows)},
bc AS (
  SELECT band_key, count(*) AS bucket_n FROM stacked GROUP BY band_key
)
SELECT count(*) AS n_buckets,
       max(bucket_n) AS max_bucket,
       sum(CASE WHEN bucket_n > {BUCKET_CAP} THEN 1 ELSE 0 END)::BIGINT
         AS buckets_dropped,
       sum(CASE WHEN bucket_n > {BUCKET_CAP} THEN bucket_n ELSE 0 END)::BIGINT
         AS docs_in_dropped
FROM bc
"""


DEDUP_MINHASH_SQL = _minhash_lsh_sql()

MINHASH_BAND_STATS_SQL = _minhash_band_stats_sql()


# ------------------------------------------------------------------ #


def simhash_sigs_df(docs_in: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, simhash): 64-bit SimHash over the
    distinct token set, one map-side Arrow pass (same rationale as
    :func:`minhash_sigs_df` -- the declarative form pays interpreted
    tokenizer HOFs plus a 64-conditional-sum shuffle of exploded token
    strings; this emits one int per doc, bit-identical to the oracle).

    64 bits (widened from 32 in round 5): at 10^12 docs, random 32-bit
    collisions alone flood Hamming<=3, and the 8-bit chunk keys of the
    old pairing join gave only 1,024 distinct join keys.  Bit b of the
    signature votes on bit b of the per-token hash; the token hash is
    two 32-bit md5 hex windows (chars 1-8 -> bits 0..31, chars 9-16 ->
    bits 32..63), parsed identically by DuckDB, so both engines see the
    same 64 independent bits.  The signature is the two's-complement
    signed 64-bit recompose (bit 63 contributes -2^63), matching
    Spark LongType / DuckDB BIGINT exactly."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(r"[^a-z0-9]+")
    # bits 0..62 recompose positively; bit 63 is the sign bit
    powers = [1 << b for b in range(63)]

    def sig_fn(batches):
        # r9: per-task token-hash memo — the distinct-token vocabulary
        # repeats across every document, so nearly all lookups hit
        # (same bounded-memo pattern as minhash_sigs_df); hex windows
        # come from the byte digest (chars 1-8 == bytes 0-4, chars
        # 9-16 == bytes 4-8)
        md5 = hashlib.md5
        ifb = int.from_bytes
        memo: dict = {}

        def h_lo_hi(t):
            v = memo.get(t)
            if v is None:
                d = md5(t.encode()).digest()
                v = (ifb(d[:4], "big"), ifb(d[4:8], "big"))
                if len(memo) >= 1 << 20:
                    memo.clear()
                memo[t] = v
            return v

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = {t for t in tok_re.split((text or "").lower()) if t}
                if not toks:
                    continue
                pairs = [h_lo_hi(t) for t in toks]
                hs_lo = np.fromiter(
                    (p[0] for p in pairs),
                    dtype=np.int64, count=len(pairs),
                )
                hs_hi = np.fromiter(
                    (p[1] for p in pairs),
                    dtype=np.int64, count=len(pairs),
                )
                bits = np.concatenate(
                    [
                        (hs_lo[:, None] >> np.arange(32)) & 1,
                        (hs_hi[:, None] >> np.arange(32)) & 1,
                    ],
                    axis=1,
                )  # (n, 64)
                votes = (2 * bits - 1).sum(axis=0)  # +1/-1 per bit
                val = sum(p for b, p in enumerate(powers) if votes[b] > 0)
                if votes[63] > 0:
                    val -= 1 << 63  # two's-complement sign bit
                ids.append(doc_id)
                sigs.append(val)
            yield pd.DataFrame(
                {"doc_id": ids, "simhash": pd.array(sigs, dtype="int64")}
            )

    schema = "doc_id " + _doc_id_sql_type(docs_in) + ", simhash bigint"
    return docs_in.select("doc_id", "text").mapInPandas(sig_fn, schema)


def dedup_simhash(spark, sf_dir):
    """64-bit SimHash over the distinct token set."""
    return simhash_sigs_df(
        _t(spark, sf_dir, "documents", spread=True)
    ).orderBy(
        "doc_id"
    )


def _simhash_ctes() -> str:
    """CTE list ending in ``sig(doc_id, simhash)`` -- shared by the
    signature oracle and the candidate-pairs oracle (mirrors
    :func:`_minhash_pairs_ctes`; no string surgery between builders).
    64-bit: h_lo/h_hi are the two 32-bit md5 hex windows; bit 63
    recomposes as -2^63 (signed BIGINT two's complement, matching the
    Spark LongType value exactly)."""
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h_lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    ) + ",\n         " + ",\n         ".join(
        f"sum(CASE WHEN (h_hi >> {b - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32, 64)
    )
    recompose = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(63)
    ) + " + (CASE WHEN s63 > 0 THEN -9223372036854775808 ELSE 0 END)"
    return f"""ex AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_DUCK})) AS tok
  FROM documents WHERE len({_TOKENS_DUCK}) > 0
), hs AS (
  SELECT doc_id,
         ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h_lo,
         ('0x' || substring(md5(tok), 9, 8))::BIGINT AS h_hi
  FROM ex
), sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM hs GROUP BY doc_id
), sig AS (
  SELECT doc_id, ({recompose})::BIGINT AS simhash FROM sums
)"""


DEDUP_SIMHASH_SQL = f"""
WITH {_simhash_ctes()}
SELECT doc_id, simhash FROM sig ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# SimHash candidate pairs: chunk-bucketed Hamming join                 #
# ------------------------------------------------------------------ #


def dedup_simhash_pairs(
    spark, sf_dir, max_hamming: int = 3, bucket_cap: int = BUCKET_CAP
):
    """Near-dup candidate pairs from the 64-bit SimHash WITHOUT an
    all-pairs scan: split the signature into 4 x 16-bit chunks -- by
    pigeonhole, any pair within Hamming distance <= 3 agrees on at
    least one whole chunk -- join on the combined chunk key, then
    verify exact Hamming distance columnar with bit_count(a XOR b).
    65,536 possible values per chunk index (vs 256 for the old byte
    chunks) keep buckets thin as the corpus grows, and -- same skew
    guard as :func:`dedup_minhash_lsh` -- buckets larger than
    ``bucket_cap`` are dropped from the join entirely: membership in a
    flood bucket means near-exact duplication, which the exact-dedup
    pass already resolves linearly.  The DuckDB oracle applies the SAME
    cap (shared ``BUCKET_CAP`` constant), so parity holds on flood
    corpora; the cap is counted by a window on ``chunk_key``, whose
    hash partitioning is exactly what the self-join needs, so the
    guard adds no extra exchange."""
    from pyspark.sql import Window

    # unsorted signatures: dedup_simhash's presentation orderBy would
    # inject a global range exchange per join side for nothing
    from .scanspread import barrier_pays

    n_docs = _t(spark, sf_dir, "documents").count()  # metadata count
    sig = simhash_sigs_df(_t(spark, sf_dir, "documents", spread=True))
    # single join key = chunk_idx * 2^16 + chunk_val: one column to
    # window over AND to join on (shuffle partitioning reused)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    (
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(65535))
                        + F.lit(i * 65536)
                    ).cast("long")
                    for i in range(4)
                ]
            )
        ).alias("chunk_key"),
    )
    bucket_n = F.count("*").over(Window.partitionBy("chunk_key"))
    # materialized once per invocation (eager localCheckpoint): the
    # self-join would otherwise run the Arrow signature pass + chunk
    # window TWICE, once per alias (the minhash_candidate_pairs
    # rationale; (doc_id, simhash, chunk_key) is the lightweight
    # proxy, 4 rows per doc)
    capped = (
        chunks.withColumn("bucket_n", bucket_n)
        .filter(F.col("bucket_n") <= bucket_cap)
        .select("doc_id", "simhash", "chunk_key")
    )
    if barrier_pays(n_docs):
        # materialize + re-spread (the minhash_candidate_pairs
        # rationale and the same measured crossover)
        capped = capped.localCheckpoint().repartition(
            spark.sparkContext.defaultParallelism, "chunk_key"
        )
    a = capped.alias("a")
    b = capped.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    return f"""
WITH {_simhash_ctes()}, chunks AS (
  SELECT doc_id, simhash,
         ((simhash >> (16 * i)) & 65535) + i * 65536 AS chunk_key
  FROM sig, unnest([0, 1, 2, 3]) AS t(i)
), capped AS (
  SELECT doc_id, simhash, chunk_key FROM (
    SELECT doc_id, simhash, chunk_key,
           count(*) OVER (PARTITION BY chunk_key) AS bucket_n
    FROM chunks)
  WHERE bucket_n <= {BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM capped a JOIN capped b
  ON a.chunk_key = b.chunk_key
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


DEDUP_SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


def simhash_chunk_stats(spark, sf_dir, bucket_cap: int = BUCKET_CAP):
    """Monitoring companion to the SimHash chunk-bucket cap (round 5;
    mirrors :func:`minhash_band_stats` / ``emb_bucket_stats``):
    chunk-bucket occupancy, how many buckets/docs the cap drops, and
    the surviving-candidate upper bound + ratio -- the number an
    operator watches to see a boilerplate flood before it sees a slow
    pairing join.  O(buckets) frame, no pair materialization."""
    sig = simhash_sigs_df(_t(spark, sf_dir, "documents", spread=True))
    chunks = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    (
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(65535))
                        + F.lit(i * 65536)
                    ).cast("long")
                    for i in range(4)
                ]
            )
        ).alias("chunk_key"),
    )
    counts = chunks.groupBy("chunk_key").agg(F.count("*").alias("bucket_n"))
    n_docs = F.sum("bucket_n") / 4  # each doc contributes 4 chunk rows
    cand_bound = F.sum(
        F.when(
            F.col("bucket_n") <= bucket_cap,
            F.col("bucket_n") * (F.col("bucket_n") - 1) / 2,
        ).otherwise(0)
    ).cast("bigint")
    return counts.agg(
        F.count("*").alias("n_buckets"),
        F.max("bucket_n").alias("max_bucket"),
        F.sum(F.when(F.col("bucket_n") > bucket_cap, 1).otherwise(0)).alias(
            "buckets_dropped"
        ),
        F.sum(
            F.when(F.col("bucket_n") > bucket_cap, F.col("bucket_n")).otherwise(0)
        ).alias("docs_in_dropped"),
        cand_bound.alias("cand_pairs_bound"),
        F.round(
            cand_bound / F.greatest(n_docs * (n_docs - 1) / 2, F.lit(1.0)), 6
        ).alias("cand_ratio"),
    )


SIMHASH_CHUNK_STATS_SQL = f"""
WITH {_simhash_ctes()}, chunks AS (
  SELECT doc_id, ((simhash >> (16 * i)) & 65535) + i * 65536 AS chunk_key
  FROM sig, unnest([0, 1, 2, 3]) AS t(i)
), bc AS (
  SELECT chunk_key, count(*) AS bucket_n FROM chunks GROUP BY chunk_key
)
SELECT count(*) AS n_buckets,
       max(bucket_n) AS max_bucket,
       sum(CASE WHEN bucket_n > {BUCKET_CAP} THEN 1 ELSE 0 END)::BIGINT
         AS buckets_dropped,
       sum(CASE WHEN bucket_n > {BUCKET_CAP} THEN bucket_n ELSE 0 END)::BIGINT
         AS docs_in_dropped,
       sum(CASE WHEN bucket_n <= {BUCKET_CAP}
                THEN bucket_n * (bucket_n - 1) / 2 ELSE 0 END)::BIGINT
         AS cand_pairs_bound,
       round(sum(CASE WHEN bucket_n <= {BUCKET_CAP}
                      THEN bucket_n * (bucket_n - 1) / 2 ELSE 0 END)
             / greatest((sum(bucket_n) / 4) * (sum(bucket_n) / 4 - 1) / 2,
                        1.0), 6) AS cand_ratio
FROM bc
"""


def shingle_sets_df(docs_in: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, sh array<string>, n_sh): the
    DISTINCT 3-shingle set per document, one map-side Arrow pass.
    Same rationale as :func:`minhash_sigs_df`: the declarative form
    (split/transform/slice/concat_ws/array_distinct HOFs) is
    interpreted per element and dominated the verify stage at the sf1
    rehearsal (119 s at 50k docs, ~75% in the set build).  Values are
    identical to ``list_distinct({shingles})`` in the oracle CTEs;
    set ORDER is unspecified on both sides (consumers use
    size/array_intersect only)."""
    import re

    import pandas as pd

    tok_re = re.compile(r"[^a-z0-9]+")

    def sets_fn(batches):
        for pdf in batches:
            ids, sets_, sizes = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in tok_re.split((text or "").lower()) if t]
                if len(toks) < 3:
                    continue
                sh = list(
                    {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
                )
                ids.append(doc_id)
                sets_.append(sh)
                sizes.append(len(sh))
            yield pd.DataFrame(
                {"doc_id": ids, "sh": sets_, "n_sh": sizes}
            )

    schema = (
        "doc_id " + _doc_id_sql_type(docs_in)
        + ", sh array<string>, n_sh int"
    )
    return docs_in.select("doc_id", "text").mapInPandas(sets_fn, schema)


def dedup_minhash_verified(
    spark, sf_dir, threshold: float = 0.5, bucket_cap: int = BUCKET_CAP
):
    """The complete text near-dup hierarchy in one operator: MinHash-
    LSH candidate pairs (banded, bucket-capped, linear) -> EXACT
    n-gram Jaccard verification on candidates only -- the production
    twin of :func:`dedup_ngram_jaccard`, whose all-pairs shingle
    self-join is the fenced correctness baseline.  The verify join is
    candidate-pair-sized (bounded by the bucket cap), with each side's
    distinct shingle set riding along once (Arrow-built, see
    :func:`shingle_sets_df`); the intersection is a columnar
    array_intersect, no shingle explosion.

    r9 scale shape: the pairs table is materialized once (it feeds
    the verify join AND the candidate-id set), and the shingle sets
    are built ONLY for documents that appear in some candidate pair —
    a semi-join prunes the corpus before the Arrow set-build, so the
    expensive distinct-shingle pass is candidate-sized, not
    corpus-sized (guide §3.2: reduce the big side before the join;
    non-candidates could never survive the inner verify joins).  The
    candidate-sized sets frame is materialized once for its two
    aliases (the minhash_candidate_pairs rationale).  Previously this
    operator ran the corpus through Python FOUR times (2 sig + 2
    set-build passes); now twice (1 sig + 1 pruned set-build)."""
    from .scanspread import barrier_pays

    n_docs = _t(spark, sf_dir, "documents").count()  # metadata count
    if barrier_pays(n_docs):
        pairs = _minhash_pairs(spark, sf_dir, bucket_cap).localCheckpoint()
        cand_ids = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        cand_docs = _t(spark, sf_dir, "documents", spread=True).join(
            cand_ids, "doc_id", "left_semi"
        )
        sets = shingle_sets_df(cand_docs).localCheckpoint()
    else:
        # below the crossover the three barrier jobs cost more than
        # the corpus passes they save (measured): keep the direct
        # lazy shape
        pairs = _minhash_pairs(spark, sf_dir, bucket_cap)
        sets = shingle_sets_df(_t(spark, sf_dir, "documents"))
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = F.round(
        inter / (F.col("n_a") + F.col("n_b") - inter), 4
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def _minhash_verified_sql(
    threshold: float = 0.5, n_rows: int | None = None
) -> str:
    return f"""
WITH {_minhash_pairs_ctes(n_rows)}, sets AS (
  SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS sh
  FROM documents WHERE len({_TOKENS_DUCK}) >= 3
), sized AS (
  SELECT doc_id, sh, len(sh) AS n_sh FROM sets WHERE len(sh) > 0
), verified AS (
  SELECT p.doc_a, p.doc_b,
         round(len(list_intersect(a.sh, b.sh))
               / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh))), 4)
           AS jaccard
  FROM lsh_pairs p
  JOIN sized a ON a.doc_id = p.doc_a
  JOIN sized b ON b.doc_id = p.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified
WHERE jaccard >= {threshold} ORDER BY doc_a, doc_b
"""


DEDUP_MINHASH_VERIFIED_SQL = _minhash_verified_sql()


# ------------------------------------------------------------------ #
# incremental dedup: a new batch against an existing corpus            #
# ------------------------------------------------------------------ #

# deterministic batch split for the driver corpora: doc_id % 5 == 0 is
# the "incoming crawl" (20%), the rest is the already-ingested corpus
INCR_SPLIT_MOD = 5


def dedup_incremental(spark, sf_dir, bucket_cap: int = BUCKET_CAP):
    """Dedup a NEW batch against an EXISTING corpus -- the production
    shape of every recurring crawl ingest: the training set is already
    deduplicated, so each incoming document only needs (a) an exact
    match lookup against existing content hashes and (b) an asymmetric
    banded-LSH probe against the existing corpus's band table.  Intra-
    batch duplicates are deliberately NOT resolved here (that is the
    standard dedup ops' job on the kept batch).

    Output, one row per incoming doc: ``exact_dup_of`` / ``near_dup_of``
    = the minimum existing doc_id matched (null if none), ``keep`` =
    both null.

    Scale shape: both probes are joins keyed on content hash / band
    key -- linear in batch + corpus size, never all-pairs.  The skew
    cap applies to the EXISTING side's bucket occupancy (a flooded
    corpus bucket means the incoming doc matches boilerplate that
    exact-dedup already collapsed); at 100 TB the existing band table
    is the thing you materialize bucketed once per corpus version and
    probe per crawl.  Banding resolves through
    :func:`minhash_banding` on the full table count, same as the
    symmetric ops; the oracle derives it from the same function."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    incoming = F.col("doc_id") % INCR_SPLIT_MOD == 0
    hashes = docs.select("doc_id", F.md5("text").alias("h"))
    exist_h = (
        hashes.filter(~incoming)
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_dup_of"))
    )
    exact = hashes.filter(incoming).join(exist_h, "h", "left").select(
        "doc_id", "exact_dup_of"
    )

    # band each SIDE separately (filter before the signature stage):
    # a single full-table bands frame consumed by both branches would
    # run the Arrow sig pass over every doc twice -- the filters do
    # not push through mapInPandas
    banding = minhash_banding(docs.count())
    ex_capped = (
        minhash_bands_df(docs.filter(~incoming), banding)
        .withColumn("bn", F.count("*").over(Window.partitionBy("band_key")))
        .filter(F.col("bn") <= bucket_cap)
        .select(F.col("doc_id").alias("ex_id"), "band_key")
    )
    near = (
        minhash_bands_df(docs.filter(incoming), banding)
        .join(ex_capped, "band_key")
        .groupBy("doc_id")
        .agg(F.min("ex_id").alias("near_dup_of"))
    )
    # -1 sentinel for "no match": a nullable BIGINT column round-trips
    # through the driver's pandas compare as float64 NaN on the DuckDB
    # side (the r2 ::BIGINT lesson), so both engines emit the sentinel
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("exact_dup_of", F.lit(-1)).alias("exact_dup_of"),
            F.coalesce("near_dup_of", F.lit(-1)).alias("near_dup_of"),
            (
                F.col("exact_dup_of").isNull()
                & F.col("near_dup_of").isNull()
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _incremental_sql(
    n_rows: int | None = None, bucket_cap: int = BUCKET_CAP
) -> str:
    # bucket_cap is threaded like n_rows (ADVICE r6): any test that
    # runs dedup_incremental with a non-default cap must regenerate
    # its oracle with the SAME cap or parity silently breaks
    return f"""
WITH {_minhash_pairs_ctes(n_rows)},
ex_side AS (
  SELECT doc_id, band_key FROM stacked WHERE doc_id % {INCR_SPLIT_MOD} <> 0
), ex_capped AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bn
    FROM ex_side)
  WHERE bn <= {bucket_cap}
), inc_side AS (
  SELECT doc_id, band_key FROM stacked WHERE doc_id % {INCR_SPLIT_MOD} = 0
), near AS (
  SELECT i.doc_id, min(e.doc_id) AS near_dup_of
  FROM inc_side i JOIN ex_capped e ON e.band_key = i.band_key
  GROUP BY i.doc_id
), hashes AS (
  SELECT doc_id, md5(text) AS h FROM documents
), exist_h AS (
  SELECT h, min(doc_id) AS exact_dup_of FROM hashes
  WHERE doc_id % {INCR_SPLIT_MOD} <> 0 GROUP BY h
)
SELECT i.doc_id,
       COALESCE(eh.exact_dup_of, -1) AS exact_dup_of,
       COALESCE(n.near_dup_of, -1) AS near_dup_of,
       (eh.exact_dup_of IS NULL AND n.near_dup_of IS NULL) AS keep
FROM hashes i
LEFT JOIN exist_h eh ON eh.h = i.h
LEFT JOIN near n ON n.doc_id = i.doc_id
WHERE i.doc_id % {INCR_SPLIT_MOD} = 0
ORDER BY i.doc_id
"""


DEDUP_INCREMENTAL_SQL = _incremental_sql()


# ------------------------------------------------------------------ #
# materialized incremental-dedup index: the production form of the     #
# probe above.  Build ONCE per corpus version (content-hash + capped   #
# band tables, bucketed on their probe join keys), then dedup each     #
# incoming crawl batch against it with two bucketed joins.             #
# ------------------------------------------------------------------ #

DEDUP_INDEX_META = "index_meta.json"


def _index_tag(index_dir: str) -> str:
    import hashlib
    import os

    return hashlib.md5(os.path.abspath(index_dir).encode()).hexdigest()[:8]


def build_dedup_index(
    docs: DataFrame,
    index_dir: str,
    banding: "tuple[int, int] | None" = None,
    bucket_cap: int = BUCKET_CAP,
    n_buckets: int = 8,
    scrubbed: bool = False,
    dup_span_scrubbed: bool = False,
    dup_grams: "DataFrame | None" = None,
) -> dict:
    """Materialize the dedup index for an EXISTING (already
    deduplicated) corpus -- the thing a recurring-crawl operator
    builds once per corpus version and probes per batch:

    - ``<index_dir>/hashes``: (h = md5(text), exact_dup_of = min
      doc_id) -- bucketed on ``h``.
    - ``<index_dir>/bands``:  (ex_id, band_key) minhash band table
      with the skew cap ALREADY applied (a flooded corpus bucket is
      boilerplate the exact pass collapsed; capping at build time
      means every probe skips it for free) -- bucketed on
      ``band_key``.
    - ``<index_dir>/index_meta.json``: the banding / cap / bucket
      layout the probe side must reproduce -- signatures only match
      if the incoming batch is banded with the SAME (b, r), so the
      policy is frozen in the index, not re-derived per probe.

    ``banding`` defaults to :func:`minhash_banding` on the indexed
    corpus count.  The bucketed layout makes every later probe join
    shuffle ONLY the incoming batch (the index side scans
    pre-partitioned; plan-asserted in tests/test_incremental_index.py
    ::test_band_probe_plan_is_asymmetric).  At 100 TB the index is a
    fraction of corpus size (one 16-byte hash + b band keys per doc)
    and is rebuilt only when the corpus version rolls.

    ``scrubbed=True`` records in the meta that ``docs.text`` is the
    PII-SCRUBBED representation (``textstats.pii_scrub_text``):
    :func:`probe_dedup_index` then scrubs the probe side before
    hashing/banding, so a re-fetched PII-bearing doc still exact-
    matches its corpus twin.  The flag is frozen in the index like the
    banding -- representation is an index property, not a per-probe
    choice.

    ``dup_span_scrubbed=True`` records that ``docs.text`` had cross-
    doc duplicated spans SPLICED OUT (the pipeline's
    ``--scrub-dup-spans`` stage).  Unlike the PII chain this transform
    is corpus-dependent, so the index must carry the corpus's
    "boilerplate list" -- ``dup_grams`` (the DataFrame[g] from
    ``textstats.dup_grams_df`` over the PRE-scrub corpus) is REQUIRED
    with the flag and lands as a fourth bucketed table
    ``<index_dir>/dup_grams``.  :func:`probe_dedup_index` splices
    incoming raw text against it (BEFORE any PII redaction, matching
    the pipeline's stage order), so a re-fetched boilerplate-bearing
    doc reproduces the indexed bytes and still exact-matches.
    :func:`update_dedup_index` refuses mismatched representations
    (the silent-degradation failure mode ADVICE r7 flagged for the
    PII variant) and rolls the gram list forward by union -- a
    monotone per-version list, like production boilerplate lists:
    grams first duplicated only ACROSS versions enter the list at the
    next version that sees them duplicated internally, never
    retroactively."""
    import json
    import os


    from ..sources import write_bucketed

    if dup_span_scrubbed and dup_grams is None:
        raise ValueError(
            "dup_span_scrubbed=True requires dup_grams (the "
            "textstats.dup_grams_df frame over the PRE-scrub corpus):"
            " without the boilerplate list a probe can never replay "
            "the splice on raw re-fetched text"
        )
    n_docs = docs.count()
    if banding is None:
        banding = minhash_banding(n_docs)
    tag = _index_tag(index_dir)
    hashes = (
        docs.select(F.col("doc_id"), F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_dup_of"))
    )
    write_bucketed(
        hashes, f"bpc_dedup_idx_h_{tag}", os.path.join(index_dir, "hashes"),
        "h", n_buckets=n_buckets,
    )
    # pre-cap per-bucket counts are materialized alongside the capped
    # band table: the cap must be re-applied on MERGED counts when the
    # index is rolled forward (update_dedup_index), and a capped table
    # alone has lost both the dropped rows and their counts.  persist
    # the banded frame so the signature pass (the expensive part) runs
    # once for both consumers.
    banded = minhash_bands_df(docs.select("doc_id", "text"), banding)
    banded.persist()
    counts = banded.groupBy("band_key").agg(F.count("*").alias("bn"))
    write_bucketed(
        counts, f"bpc_dedup_idx_c_{tag}",
        os.path.join(index_dir, "band_counts"), "band_key",
        n_buckets=n_buckets,
    )
    ok = (
        docs.sparkSession.table(f"bpc_dedup_idx_c_{tag}")
        .filter(F.col("bn") <= bucket_cap)
        .select("band_key")
    )
    bands = (
        banded.join(ok, "band_key", "left_semi")
        .select(F.col("doc_id").alias("ex_id"), "band_key")
    )
    write_bucketed(
        bands, f"bpc_dedup_idx_b_{tag}", os.path.join(index_dir, "bands"),
        "band_key", n_buckets=n_buckets,
    )
    banded.unpersist()
    if dup_grams is not None:
        write_bucketed(
            dup_grams.select("g").distinct(),
            f"bpc_dedup_idx_g_{tag}",
            os.path.join(index_dir, "dup_grams"), "g",
            n_buckets=n_buckets,
        )
    meta = {
        "banding": list(banding),
        "bucket_cap": bucket_cap,
        "n_buckets": n_buckets,
        "n_docs": n_docs,
        # frozen so consumers can register the (possibly empty) tables
        # with an explicit schema instead of file inference
        "doc_id_type": docs.schema["doc_id"].dataType.simpleString(),
        "scrubbed": bool(scrubbed),
        "dup_span_scrubbed": bool(dup_span_scrubbed),
    }
    with open(os.path.join(index_dir, DEDUP_INDEX_META), "w") as f:
        json.dump(meta, f)
    return meta


def _index_schemas(meta: dict) -> "dict[str, str] | dict[str, None]":
    """DDL column lists for the three index tables, or Nones (fall
    back to file inference) for indexes built before doc_id_type."""
    dt = meta.get("doc_id_type")
    if dt is None:
        return {
            "hashes": None, "bands": None, "band_counts": None,
            "dup_grams": None,
        }
    return {
        "hashes": f"`h` string, `exact_dup_of` {dt}",
        "bands": f"`ex_id` {dt}, `band_key` string",
        "band_counts": "`band_key` string, `bn` bigint",
        "dup_grams": "`g` bigint",
    }


def update_dedup_index(
    new_docs: DataFrame,
    prior_dir: str,
    out_dir: str,
    scrubbed: "bool | None" = None,
    dup_span_scrubbed: "bool | None" = None,
    new_dup_grams: "DataFrame | None" = None,
) -> dict:
    """Roll the corpus-version index forward: prior index + the batch
    of NEWLY KEPT docs -> the next version's index, WITHOUT re-signing
    the existing corpus.  Signatures (the expensive text pass) are
    computed only for the batch; the prior index contributes its
    materialized hash/band/count tables, so the update costs
    O(batch text + index size), never O(corpus text).

    Semantics are exactly a fresh :func:`build_dedup_index` over the
    union corpus at the FROZEN banding (equivalence is test-asserted):

    - hashes: union + groupBy min -- the global min doc_id per hash.
    - band cap: re-applied on MERGED per-bucket counts (prior pre-cap
      counts + batch counts).  A bucket that crosses the cap only
      after the merge loses its PRIOR rows too -- which is why the
      build materializes ``band_counts``; the capped band table alone
      has lost both the dropped rows and their counts.  Indexes built
      before band_counts existed must be rebuilt once.

    Banding stays frozen at the prior version's (b, r) -- probe
    signatures only match the index they were banded for.  The
    returned meta carries ``banding_stale``: when corpus growth moves
    :func:`minhash_banding` past the frozen policy, schedule a full
    rebuild at the next version roll (an epoch event, not a per-batch
    one; rehearsed in tools/banding_epoch_rehearsal.py).

    ``scrubbed`` asserts the representation of ``new_docs.text``
    against the prior index's frozen flag: pass the current run's
    scrub setting and a mismatch raises instead of silently merging
    raw hashes into a scrubbed index (or vice versa).  ``None`` skips
    the check (caller guarantees consistency)."""
    import json
    import os

    from ..sources import register_bucketed, write_bucketed

    with open(os.path.join(prior_dir, DEDUP_INDEX_META)) as f:
        prior = json.load(f)
    if not os.path.isdir(os.path.join(prior_dir, "band_counts")):
        raise ValueError(
            f"{prior_dir} has no band_counts table (built before "
            "update support) -- rebuild it once with build_dedup_index"
        )
    banding = tuple(prior["banding"])
    cap, n_buckets = prior["bucket_cap"], prior["n_buckets"]
    if scrubbed is not None and bool(scrubbed) != prior.get(
        "scrubbed", False
    ):
        raise ValueError(
            f"text representation mismatch: index at {prior_dir} was "
            f"built scrubbed={prior.get('scrubbed', False)} but this "
            f"run supplies scrubbed={bool(scrubbed)} docs -- mixing "
            "representations silently breaks exact-hash dedup"
        )
    if dup_span_scrubbed is not None and bool(
        dup_span_scrubbed
    ) != prior.get("dup_span_scrubbed", False):
        raise ValueError(
            f"text representation mismatch: index at {prior_dir} was "
            f"built dup_span_scrubbed="
            f"{prior.get('dup_span_scrubbed', False)} but this run "
            f"supplies dup_span_scrubbed={bool(dup_span_scrubbed)} "
            "docs -- mixing representations silently breaks "
            "exact-hash dedup"
        )
    spark = new_docs.sparkSession
    tag_p, tag_o = _index_tag(prior_dir), _index_tag(out_dir)
    if tag_p == tag_o:
        # in-place update would overwrite tables while scanning them
        raise ValueError("out_dir must differ from prior_dir")

    schemas = _index_schemas(prior)
    batch_dt = new_docs.schema["doc_id"].dataType.simpleString()
    if prior.get("doc_id_type") not in (None, batch_dt):
        raise ValueError(
            f"batch doc_id type {batch_dt} != index "
            f"{prior['doc_id_type']}"
        )
    prior_h = register_bucketed(
        spark, f"bpc_dedup_idx_h_{tag_p}",
        os.path.join(prior_dir, "hashes"), "h", n_buckets=n_buckets,
        schema=schemas["hashes"],
    )
    new_h = new_docs.select(
        F.md5("text").alias("h"), F.col("doc_id").alias("exact_dup_of")
    )
    hashes = (
        prior_h.unionByName(new_h)
        .groupBy("h")
        .agg(F.min("exact_dup_of").alias("exact_dup_of"))
    )
    write_bucketed(
        hashes, f"bpc_dedup_idx_h_{tag_o}", os.path.join(out_dir, "hashes"),
        "h", n_buckets=n_buckets,
    )

    banded = minhash_bands_df(new_docs.select("doc_id", "text"), banding)
    banded.persist()
    prior_c = register_bucketed(
        spark, f"bpc_dedup_idx_c_{tag_p}",
        os.path.join(prior_dir, "band_counts"), "band_key",
        n_buckets=n_buckets, schema=schemas["band_counts"],
    )
    counts = (
        prior_c.unionByName(
            banded.groupBy("band_key").agg(F.count("*").alias("bn"))
        )
        .groupBy("band_key")
        .agg(F.sum("bn").cast("bigint").alias("bn"))
    )
    write_bucketed(
        counts, f"bpc_dedup_idx_c_{tag_o}",
        os.path.join(out_dir, "band_counts"), "band_key",
        n_buckets=n_buckets,
    )
    ok = (
        spark.table(f"bpc_dedup_idx_c_{tag_o}")
        .filter(F.col("bn") <= cap)
        .select("band_key")
    )
    prior_b = register_bucketed(
        spark, f"bpc_dedup_idx_b_{tag_p}",
        os.path.join(prior_dir, "bands"), "band_key", n_buckets=n_buckets,
        schema=schemas["bands"],
    )
    bands = (
        prior_b.unionByName(
            banded.select(F.col("doc_id").alias("ex_id"), "band_key")
        )
        .join(ok, "band_key", "left_semi")
        .select("ex_id", "band_key")
    )
    write_bucketed(
        bands, f"bpc_dedup_idx_b_{tag_o}", os.path.join(out_dir, "bands"),
        "band_key", n_buckets=n_buckets,
    )
    banded.unpersist()

    if new_dup_grams is not None and not prior.get("dup_span_scrubbed"):
        raise ValueError(
            f"index at {prior_dir} was not built dup_span_scrubbed; "
            "passing new_dup_grams would silently change the text "
            "representation mid-roll"
        )
    if prior.get("dup_span_scrubbed"):
        gdir_p = os.path.join(prior_dir, "dup_grams")
        if not os.path.isdir(gdir_p):
            raise ValueError(
                f"{prior_dir} records dup_span_scrubbed but has no "
                "dup_grams table -- rebuild it once with "
                "build_dedup_index(..., dup_grams=...)"
            )
        prior_g = register_bucketed(
            spark, f"bpc_dedup_idx_g_{tag_p}", gdir_p, "g",
            n_buckets=n_buckets, schema=schemas["dup_grams"],
        )
        # monotone roll: the next version's boilerplate list is the
        # prior list UNION the batch's own duplicated grams
        out_g = (
            prior_g
            if new_dup_grams is None
            else prior_g.unionByName(
                new_dup_grams.select("g")
            ).distinct()
        )
        write_bucketed(
            out_g, f"bpc_dedup_idx_g_{tag_o}",
            os.path.join(out_dir, "dup_grams"), "g",
            n_buckets=n_buckets,
        )

    n_docs = prior.get("n_docs", 0) + new_docs.count()
    meta = {
        "banding": list(banding),
        "bucket_cap": cap,
        "n_buckets": n_buckets,
        "n_docs": n_docs,
        "doc_id_type": batch_dt,
        "banding_stale": minhash_banding(n_docs) != banding,
        "scrubbed": prior.get("scrubbed", False),
        "dup_span_scrubbed": prior.get("dup_span_scrubbed", False),
    }
    with open(os.path.join(out_dir, DEDUP_INDEX_META), "w") as f:
        json.dump(meta, f)
    return meta


def probe_dedup_index(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> DataFrame:
    """Dedup an incoming batch against a :func:`build_dedup_index`
    index: one row per incoming doc with ``exact_dup_of`` /
    ``near_dup_of`` (minimum existing doc_id matched, -1 if none) and
    ``keep`` (both -1) -- the same output contract as the
    ``dedup_incremental`` driver query, produced by two joins that are
    linear in batch + index size.  Intra-batch duplicates are NOT
    resolved here (the standard ops' job on the kept batch).

    Both probes join against BUCKETED index tables re-registered via
    :func:`..sources.register_bucketed`: only the incoming side
    shuffles (asymmetric join -- the index side's exchange was paid
    once at build; plan-asserted in tests/test_incremental_index.py
    ::test_band_probe_plan_is_asymmetric).

    If the index meta records ``scrubbed: true`` the probe text is
    passed through the PII redaction chain before hashing/banding --
    the index holds hashes of the SCRUBBED representation, so probing
    raw re-fetched text would miss every PII-bearing exact dup.
    ``dup_span_scrubbed: true`` likewise splices the probe text
    against the index's frozen ``dup_grams`` boilerplate list FIRST
    (the pipeline scrubs dup spans before PII, and the gram list was
    computed on pre-PII text -- replay must match that order)."""
    import json
    import os

    from ..sources import register_bucketed

    with open(os.path.join(index_dir, DEDUP_INDEX_META)) as f:
        meta = json.load(f)
    tag = _index_tag(index_dir)
    schemas = _index_schemas(meta)
    if meta.get("dup_span_scrubbed"):
        gdir = os.path.join(index_dir, "dup_grams")
        if not os.path.isdir(gdir):
            raise ValueError(
                f"index at {index_dir} records dup_span_scrubbed but "
                "has no dup_grams table -- rebuild it once with "
                "build_dedup_index(..., dup_grams=...)"
            )
        from .textstats import dup_span_scrub_df

        grams = register_bucketed(
            spark, f"bpc_dedup_idx_g_{tag}", gdir, "g",
            n_buckets=meta["n_buckets"], schema=schemas["dup_grams"],
        )
        new_docs = dup_span_scrub_df(
            new_docs.select("doc_id", "text"),
            normal_form=False,
            grams=grams,
        ).select("doc_id", F.col("scrubbed_text").alias("text"))
    if meta.get("scrubbed"):
        from .textstats import pii_scrub_text

        new_docs = new_docs.withColumn(
            "text", pii_scrub_text(F.col("text"))
        )
    exist_h = register_bucketed(
        spark, f"bpc_dedup_idx_h_{tag}", os.path.join(index_dir, "hashes"),
        "h", n_buckets=meta["n_buckets"], schema=schemas["hashes"],
    )
    ex_bands = register_bucketed(
        spark, f"bpc_dedup_idx_b_{tag}", os.path.join(index_dir, "bands"),
        "band_key", n_buckets=meta["n_buckets"], schema=schemas["bands"],
    )
    exact = (
        new_docs.select("doc_id", F.md5("text").alias("h"))
        .join(exist_h, "h", "left")
        .select("doc_id", "exact_dup_of")
    )
    near = (
        minhash_bands_df(
            new_docs.select("doc_id", "text"), tuple(meta["banding"])
        )
        .join(ex_bands, "band_key")
        .groupBy("doc_id")
        .agg(F.min("ex_id").alias("near_dup_of"))
    )
    # sentinel typed to the caller's doc_id dtype: pipeline corpora use
    # STRING doc-XXXX ids (the r5 lesson -- every dedup op must work on
    # BOTH id types), driver corpora BIGINT; a bare int lit would force
    # a string->bigint cast that throws on the first real id
    sentinel = F.lit(-1).cast(new_docs.schema["doc_id"].dataType)
    return exact.join(near, "doc_id", "left").select(
        "doc_id",
        F.coalesce("exact_dup_of", sentinel).alias("exact_dup_of"),
        F.coalesce("near_dup_of", sentinel).alias("near_dup_of"),
        (
            F.col("exact_dup_of").isNull() & F.col("near_dup_of").isNull()
        ).alias("keep"),
    )


# ------------------------------------------------------------------ #
# duplicate-cluster resolution: candidate pairs -> connected           #
# components -> canonical keep-set                                     #
# ------------------------------------------------------------------ #


def _ckpt(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Per-round lineage cut for the iterative component loops.

    ``checkpoint_dir=None`` (default) -> ``localCheckpoint``: blocks
    live on executors -- fast, fine on local[*], but on a real cluster
    one executor loss mid-iteration makes the job unrecoverable (the
    truncated lineage cannot recompute the lost blocks).  Passing a
    reliable (HDFS-compatible, cluster-visible) directory switches to
    ``checkpoint()``: blocks are written to storage that survives
    executor loss -- the 100-TB setting, threaded through
    ``jobs/run_pipeline.py --checkpoint-dir``."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir appends a random UUID subdirectory, so comparing
    # getCheckpointDir() to the raw dir never matches -- memoize the
    # last dir we passed instead, or every _ckpt call would mint a
    # fresh UUID dir and checkpoint files would pile up per iteration
    if getattr(sc, "_bps_ckpt_dir", None) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        sc._bps_ckpt_dir = checkpoint_dir
    return df.checkpoint(eager=True)


def _star_components(
    pairs: DataFrame,
    max_rounds: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): round count is O(log^2 n) REGARDLESS of component
    diameter, unlike min-label propagation whose rounds equal the
    diameter.  This is the long-chain fallback behind
    :func:`dedup_clusters`.

    ``pairs``: undirected candidate edges (doc_a < doc_b).  Returns
    (doc_id, cluster_id) for every node touched by an edge, cluster_id
    = component minimum.

    Per round: large-star attaches every strictly-larger neighbor of a
    node to that node's least neighbor-or-self; small-star (on the
    high->low oriented result) attaches every smaller neighbor and the
    node itself to its least neighbor.  Both are one groupBy + one
    join keyed on the node -- edge-sized shuffles.  At the fixed point
    the edge set is a union of stars centered at component minima."""
    e = (
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )  # canonical orientation src > dst, positional (src, dst)
        .distinct()
    )
    e = _ckpt(e, checkpoint_dir)
    for _ in range(max_rounds):
        # large-star over the full neighborhood (both orientations);
        # unionByName -- a positional union would silently undo the swap
        nbrs = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mn = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
        mn = mn.select("src", F.least("src", "mn").alias("m"))
        ls = (
            nbrs.join(mn, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star on the (src > dst)-oriented large-star output
        mn2 = ls.groupBy("src").agg(F.min("dst").alias("mn"))
        ss = (
            ls.join(mn2, "src")
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .unionByName(mn2.select("src", F.col("mn").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .distinct()
        )
        ss = _ckpt(ss, checkpoint_dir)
        # both sides are distinct canonical-oriented sets, so equality
        # is |e| == |ss| plus one one-sided difference being empty --
        # one exceptAll job per round, not two
        changed = (
            1
            if ss.count() != e.count()
            else ss.exceptAll(e).count()
        )
        e = ss
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"_star_components: edge set still moving after {max_rounds} "
            "alternating rounds -- should be impossible for any graph "
            "(O(log^2 n) bound); investigate the edge input"
        )
    labels = e.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
    )
    mins = (
        e.select(F.col("dst").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return labels.unionByName(mins)


def resolve_components(
    pairs: DataFrame,
    max_iters: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected-component labels (doc_id, cluster_id) for every node
    touched by a candidate pair, cluster_id = component min.

    Algorithm: iterative min-label propagation over ONLY the nodes
    that appear in candidate pairs -- singletons can never change label,
    so the iterated table is edge-sized, not corpus-sized (at 10^12
    docs with a ~1% near-dup rate that is a 100x smaller shuffle per
    round).  Rounds = component diameter; duplicate clusters are
    shallow (near-clique), so this converges in 2-3 rounds.
    ``localCheckpoint`` truncates the growing plan per round.  If a
    long-chain graph exhausts ``max_iters`` (diameter > rounds), the
    run FALLS BACK to :func:`_star_components` -- alternating
    large-star/small-star, O(log^2 n) rounds independent of diameter --
    instead of raising, so pathological chains cost extra rounds,
    never a wrong answer."""
    edges = (
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
    )
    edges = _ckpt(edges, checkpoint_dir)
    labels = _ckpt(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id")),
        checkpoint_dir,
    )
    # convergence via the MONOTONE label-sum invariant when labels are
    # NUMERIC: min-label propagation only ever DECREASES labels, so
    # sum(cluster_id) is strictly decreasing until the fixed point and
    # "sum unchanged" is EXACTLY "no label changed" -- one cheap
    # decimal-exact scan of the just-checkpointed labels per round
    # instead of an edge-sized new-vs-old join (r5; decimal(38,0) so a
    # 10^12-node sum cannot overflow or silently wrap).  STRING labels
    # (the pipeline's doc-XXXX ids) are also monotone (lexicographic
    # min) but have no summable surrogate, so they keep the exact
    # join-based changed count.
    numeric_labels = dict(labels.dtypes)["cluster_id"] in (
        "tinyint", "smallint", "int", "bigint",
    )

    def label_sum(lbl):
        return lbl.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)"))
        ).collect()[0][0]

    def join_changed(new, old):
        return (
            new.alias("n")
            .join(old.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )

    prev_sum = label_sum(labels) if numeric_labels else None
    changed = -1  # set each round; -1 only if max_iters < 1
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.doc_id == nbr.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        new_labels = _ckpt(new_labels, checkpoint_dir)
        if numeric_labels:
            new_sum = label_sum(new_labels)
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
        else:
            changed = join_changed(new_labels, labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        # diameter > max_iters: switch to the diameter-independent
        # star algorithm (silent wrong labels would diverge from the
        # exact recursive-CTE oracle undetectably; a slower correct
        # path is the right degradation)
        labels = _star_components(pairs, checkpoint_dir=checkpoint_dir)
    return labels


def dedup_clusters(spark, sf_dir, max_iters: int = 20):
    """(doc_id, cluster_id, keep) for every document: connected
    components (:func:`resolve_components`) over the MinHash-LSH
    candidate pairs, cluster_id = the lexicographic min doc_id of the
    component, keep = is-canonical.  Singletons keep themselves (the
    full corpus joins back once at the end with cluster_id = doc_id
    for untouched docs)."""
    # unsorted pairs: no global sort paid
    pairs = _minhash_pairs(spark, sf_dir)
    labels = resolve_components(pairs, max_iters)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _clusters_sql(n_rows: int | None = None) -> str:
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(n_rows)},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
reach (doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id
)
SELECT doc_id, min(lbl) AS cluster_id, (doc_id = min(lbl)) AS keep
FROM reach GROUP BY doc_id ORDER BY doc_id
"""


DEDUP_CLUSTERS_SQL = _clusters_sql()


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_clusters": dedup_clusters,
    "minhash_band_stats": minhash_band_stats,
    "simhash_chunk_stats": simhash_chunk_stats,
    "dedup_minhash_verified": dedup_minhash_verified,
    "dedup_incremental": dedup_incremental,
}

ORACLES = {
    "minhash_band_stats": MINHASH_BAND_STATS_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_simhash_pairs": DEDUP_SIMHASH_PAIRS_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "simhash_chunk_stats": SIMHASH_CHUNK_STATS_SQL,
    "dedup_minhash_verified": DEDUP_MINHASH_VERIFIED_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
}
