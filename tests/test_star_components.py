"""Large-star/small-star connected components: the diameter-
independent fallback behind dedup_clusters.

1. unit: _star_components on synthetic edge lists (long chain, clique,
   pair, forest) must label every node with its component minimum.
2. corpus: a seeded documents table whose MinHash-LSH candidate pairs
   form a >20-diameter CHAIN -- min-label propagation alone cannot
   converge within max_iters=20, so dedup_clusters must fall back and
   still be hash-exact vs the recursive-CTE oracle."""

import hashlib
import random
import re

import duckdb
import pytest

from boilerpipe_coffee_spark.operators.dedup import (
    _MINHASH_AB,
    _P,
    DEDUP_CLUSTERS_SQL,
    N_BANDS,
    _star_components,
    dedup_clusters,
)
from test_dedup_guard import _write_documents

CHAIN_LEN = 30  # diameter 29 > max_iters 20


def test_star_components_random_graph_vs_union_find(spark):
    """Seeded random graph (mixed chains, cliques, singleton-adjacent
    edges): star-components labels must equal a plain python
    union-find's component minima."""
    rng = random.Random(99)
    nodes = list(range(0, 400))
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(250)
        )
        if a != b
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(
        sorted(edges), "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.cluster_id for r in _star_components(df).collect()}
    assert got == want


def test_star_components_labels_min(spark):
    edges = []
    edges += [(i, i + 1) for i in range(100, 150)]          # 51-chain
    edges += [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique
    edges += [(900, 901)]                                   # pair
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r.doc_id: r.cluster_id for r in _star_components(df).collect()
    }
    want = {i: 100 for i in range(100, 151)}
    want.update({i: 0 for i in range(5)})
    want.update({900: 900, 901: 900})
    assert got == want


# ---------------------------------------------------------------- #
# deterministic Python mirror of the Spark/DuckDB minhash bands     #
# ---------------------------------------------------------------- #


def _band_keys(text):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) < 3:
        return set()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P
        for s in shingles
    ]
    # legacy 8-signature banding: this corpus is far below
    # MINHASH_LEGACY_N, so the operators resolve to (4 bands, 2 rows)
    sig = [min((a * h + b) % _P for h in hs) for a, b in _MINHASH_AB[:8]]
    return {(j, sig[2 * j], sig[2 * j + 1]) for j in range(N_BANDS)}


def _build_chain_corpus():
    """Greedy seed search: each next doc replaces a block of words in
    the previous one, accepted only if it band-collides with its
    predecessor and with NO earlier doc -- so the LSH pair graph is
    exactly the path 0-1-...-(n-1).  All hashing is md5-based, so the
    search result is deterministic."""
    rng = random.Random(20240816)

    def fresh_words(n):
        return [
            "w" + "".join(rng.choice("abcdefghijklmnop") for _ in range(7))
            for _ in range(n)
        ]

    docs = [fresh_words(40)]
    bands = [_band_keys(" ".join(docs[0]))]
    for i in range(1, CHAIN_LEN):
        for _attempt in range(200):
            cand = list(docs[i - 1])
            start = rng.randrange(0, len(cand) - 15)
            cand[start : start + 15] = fresh_words(15)
            bk = _band_keys(" ".join(cand))
            if not (bk & bands[i - 1]):
                continue  # link to predecessor failed
            if any(bk & bands[j] for j in range(i - 1)):
                continue  # accidental shortcut -> would shrink diameter
            docs.append(cand)
            bands.append(bk)
            break
        else:
            raise AssertionError(f"chain search stuck at doc {i}")
    return [" ".join(d) for d in docs]


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    texts = _build_chain_corpus()
    rows = [(i, t) for i, t in enumerate(texts)]
    return _write_documents(tmp_path_factory.mktemp("chain"), rows)


def test_long_chain_converges_and_matches_oracle(spark, chain_dir):
    """Diameter-29 candidate chain: the default call (max_iters=20)
    previously raised; now the star fallback resolves it, hash-exact
    vs the exact recursive-CTE oracle."""
    got = sorted(
        (r.doc_id, r.cluster_id, r.keep)
        for r in dedup_clusters(spark, chain_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{chain_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(DEDUP_CLUSTERS_SQL).fetchall())
    con.close()
    assert got == want
    # and the chain really is one component rooted at doc 0
    assert all(cl == 0 for _, cl, _ in got)
    assert [d for d, _, k in got if k] == [0]


def test_reliable_checkpoint_dir_identical_labels(spark, tmp_path):
    """VERDICT r4 task 2: passing a reliable ``checkpoint_dir`` (the
    real-cluster executor-loss-safe mode) must change ONLY the lineage
    strategy, never the labels -- both the min-label path and the
    star fallback, on the same seeded graph as the union-find test."""
    import random

    from boilerpipe_coffee_spark.operators.dedup import resolve_components

    rng = random.Random(7)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(300), rng.randrange(300)) for _ in range(180)
            )
            if a != b
        }
    )
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    ck = str(tmp_path / "ckpt")

    base = sorted(
        (r.doc_id, r.cluster_id) for r in resolve_components(pairs).collect()
    )
    reliable = sorted(
        (r.doc_id, r.cluster_id)
        for r in resolve_components(pairs, checkpoint_dir=ck).collect()
    )
    assert base == reliable
    # the reliable dir must actually have been used (blocks on storage,
    # not executors -- the whole point of the mode)
    import os

    assert any(os.scandir(ck)), "checkpoint dir never written"

    # star fallback with a reliable dir: 30-node chain, diameter 29
    # > max_iters=3 forces the fallback on both runs
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a bigint, doc_b bigint"
    )
    ck2 = str(tmp_path / "ckpt2")
    star_base = sorted(
        (r.doc_id, r.cluster_id)
        for r in resolve_components(chain, max_iters=3).collect()
    )
    star_reliable = sorted(
        (r.doc_id, r.cluster_id)
        for r in resolve_components(
            chain, max_iters=3, checkpoint_dir=ck2
        ).collect()
    )
    assert star_base == star_reliable
    assert all(cl == 0 for _, cl in star_base)


def test_components_large_random_graph(spark):
    """Scale-shaped stress: 30k nodes / ~60k random edges (mixed
    component sizes, including one giant component) resolved by the
    default path and verified against a python union-find -- an order
    of magnitude beyond the 400-node unit graph, so iteration-count
    and fallback behavior get exercised on a graph whose structure is
    not hand-shaped."""
    import random

    from boilerpipe_coffee_spark.operators.dedup import resolve_components

    rng = random.Random(20260817)
    n = 30_000
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(60_000)
        )
        if a != b
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(
        sorted(edges), "doc_a bigint, doc_b bigint"
    ).repartition(8)
    got = {
        r.doc_id: r.cluster_id for r in resolve_components(df).collect()
    }
    assert got == want
