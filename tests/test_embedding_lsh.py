"""Embedding near-dup LSH pairs: skew-guard (vector flood), recall vs
the brute-force baseline, and oracle parity on an adversarial corpus --
the behaviors the driver's organic-corpus comparison cannot cover."""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from boilerpipe_coffee_spark.operators.similarity import (
    DEDUP_EMB_LSH_SQL,
    DIM,
    EMB_BUCKET_CAP,
    dedup_embedding_cosine,
    dedup_embedding_lsh_pairs,
)

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


def _vec(seed: int):
    """Deterministic unit-ish vector from a tiny LCG (no numpy dep)."""
    x = seed * 2654435761 % (2**32)
    out = []
    for _ in range(DIM):
        x = (1103515245 * x + 12345) % (2**31)
        out.append((x / (2**31)) * 2 - 1)
    return out


def _write_embeddings(tmp_path, rows):
    """rows: list of (vec_id:int, vector:list[float])."""
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def flood_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vecflood")
    flood = _vec(7)
    rows = [(i, flood) for i in range(600)]  # 600 > EMB_BUCKET_CAP
    # a genuine near-dup pair OUTSIDE the flood: same base vector with
    # a small deterministic perturbation (cosine ~0.99)
    base = _vec(99)
    pert = [x + 0.05 * p for x, p in zip(base, _vec(123))]
    rows += [(9001, base), (9002, pert)]
    return _write_embeddings(tmp, rows)


def test_bucket_cap_bounds_identical_vector_flood(spark, flood_dir):
    """600 identical vectors would emit ~179,700 cosine-1.0 pairs per
    table without the cap; with it the flood contributes ZERO pairs
    (identical vectors are exact-dup territory) while the genuine
    near-dup pair still collides in at least one uncapped table."""
    assert 600 > EMB_BUCKET_CAP
    got = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_lsh_pairs(spark, flood_dir).collect()
    }
    assert got == {(9001, 9002)}, got


def test_flood_parity_with_oracle(spark, flood_dir):
    """The DuckDB oracle applies the SAME bucket cap, so both engines
    agree even when the cap is doing real work."""
    got = sorted(
        (r.vec_a, r.vec_b, r.cosine)
        for r in dedup_embedding_lsh_pairs(spark, flood_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{flood_dir}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(DEDUP_EMB_LSH_SQL).fetchall())
    con.close()
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, cg), (_, _, cw) in zip(got, want):
        assert math.isclose(cg, cw, abs_tol=1e-4)


def test_recall_vs_brute_force_sf001(spark):
    """LSH-verified pairs are a SUBSET of the brute-force baseline
    (same exact-cosine filter) and recall is high.  Planes are
    md5-derived, so recall on a fixed corpus is deterministic:
    6/7 at sf0.001."""
    bf = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, SF_001).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_lsh_pairs(spark, SF_001).collect()
    }
    assert lsh <= bf
    assert len(bf) == 7
    assert len(lsh) >= 6  # deterministic 6/7 with T=12 x B=4 planes


def test_full_recall_sf01(spark):
    """At sf0.01 the T=12 x B=4 family recovers ALL 14 brute-force
    pairs -- the candidate set is bounded (capped buckets) yet misses
    nothing on the organic corpus."""
    bf = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, SF_01).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_lsh_pairs(spark, SF_01).collect()
    }
    assert lsh == bf
    assert len(bf) == 14


def test_flood_visible_in_bucket_stats(spark, flood_dir):
    """The monitoring companion must report the vector flood that the
    cap silently (by design) drops from the candidate join."""
    from boilerpipe_coffee_spark.operators.similarity import (
        N_TABLES,
        emb_bucket_stats,
    )

    s = emb_bucket_stats(spark, flood_dir).collect()[0]
    assert s.max_bucket >= 600  # the flood bucket, in every table
    assert s.buckets_dropped >= N_TABLES
    assert s.vecs_in_dropped >= 600 * N_TABLES
