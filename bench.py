#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

  {"metric": "article_extract_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "docs_per_sec": <headline throughput>, "n_docs": N}

The headline metric is ArticleExtractor throughput over the
deterministic interleaved corpus (FIXTURES.md), materialized once to
parquet so the timed job is scan -> extract -> count, like production.

--scaling: cluster-size scaling evidence (BASELINE.json north rule):
runs the same extraction job on the same input at local[8] and
local[32] in fresh JVMs and reports both throughputs + efficiency
(T32/T8)/4.

--extract-only --master M --docs N --corpus PATH: internal child mode.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS_PER_SF = 200_000  # sf 0.1 -> 20k interleaved docs


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


CORPUS_VERSION = "v1"  # bump when fixtures.py generation changes


def _corpus_path(sf: float, n_docs: int) -> str:
    return f"/tmp/bpc_bench_corpus_{CORPUS_VERSION}_sf{sf}_n{n_docs}"


def _materialize_corpus(spark, sf: float, n_docs: int) -> str:
    # many small files so the scan splits into enough tasks for any
    # core count under test (production relies on
    # spark.sql.files.maxPartitionBytes for the same effect)
    path = _corpus_path(sf, n_docs)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from boilerpipe_coffee_spark.sources import synth_interleaved

        synth_interleaved(
            spark, n_docs, seed=42, partitions=max(256, n_docs // 200)
        ).write.mode("overwrite").parquet(path)
    return path


_BENCH_CONF = {
    # split the scan fine enough that every core has several tasks;
    # at bench scale files are ~1 MB, production uses the default 128m
    "spark.sql.files.maxPartitionBytes": "4m",
    "spark.sql.files.openCostInBytes": "262144",
    # ContextCleaner only reclaims shuffle files/broadcasts after a
    # driver GC; the default periodicGC (30 min) never fires within a
    # bench run, so ~110 queries of shuffle state accumulate and
    # inflate late-suite timings (r4 diagnosis: lsh_pairs 7.3 s
    # in-suite vs ~3-5 s with cleanup).  20 s keeps the long-lived
    # session at steady state -- the same setting a production driver
    # hosting many queries would run with.
    "spark.cleaner.periodicGC.interval": "20s",
}


def _timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


# Every timed query runs once per PASS and the reported number is the
# per-query MEDIAN across passes.  The host's run-to-run variance is
# +/-30% (thermal/neighbors, CLAUDE.md), so single-shot timings cannot
# distinguish a regression from noise; interleaving whole passes (not
# per-query repeats) keeps slow host phases from biasing any one
# query, and ratio metrics (staged/prod) pair measurements WITHIN a
# pass so host drift cancels.
N_PASSES = 3

# the operator suite, grouped by family so round-over-round deltas can
# be attributed per family
SUITE = [
    # relational / window family
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "orders_cube",
    "sessionize_events",
    "sessionize_native_window",
    "numwords_rules_classify",
    "asof_last_click_before_purchase",
    "range_join_nearby_events",
    "events_salted_agg",
    "events_json_props",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_simhash_pairs",
    # similarity family
    "embedding_cosine_topk",
    "ann_lsh_buckets",
    "ann_ivf_trained_topk",
    "dedup_embedding_lsh_pairs",
    # textstats family
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "repetition_stats",
    "top_terms",
    "bigram_pmi",
    "source_mixture_sample",
    "tfidf_top_terms",
    "unigram_logprob_quality",
    "contamination_check",
    "dup_span_stats",
    "dup_span_scrub",
    "packing_stats",
    "quality_histogram_quantiles",
    "doc_chunks",
    "stratified_sample",
    "pack_concat_split",
]


def run_bench() -> dict:
    import statistics

    from boilerpipe_coffee_spark.operators import extract, extract_staged
    from boilerpipe_coffee_spark.plans import get_spark
    from boilerpipe_coffee_spark.sources import read_interleaved

    sf = _sf_from_dir(SF_DIR)
    n_docs = max(int(DOCS_PER_SF * sf), 500)
    spark = get_spark("bpc-bench", master=f"local[{CPUS}]", extra_conf=_BENCH_CONF)
    corpus = _materialize_corpus(spark, sf, n_docs)

    docs = read_interleaved(spark, corpus)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(ROOT, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

    import shutil

    from boilerpipe_coffee_spark.operators.pipeline import (
        extract_balanced_scoped,
        run_partitioned,
    )

    def _balanced_count():
        with extract_balanced_scoped(docs, "ArticleExtractor") as bal:
            return bal.count()

    rp_dir = f"/tmp/bpc_bench_rp_{os.getpid()}"

    def _run_partitioned_fresh():
        # fresh run each time (resume semantics are tested, not
        # benched): clear the output so all buckets execute
        shutil.rmtree(rp_dir, ignore_errors=True)
        return run_partitioned(spark, docs, rp_dir, "ArticleExtractor",
                               n_buckets=8)

    # incremental-ingest probe (r8: the recurring-crawl hot path):
    # index built ONCE over the existing split (setup cost, untimed --
    # it's per corpus version, not per batch), probe timed per pass.
    # Forced evaluation via bit_xor(xxhash64): a bare count() can let
    # Catalyst eliminate the probe's left joins (the r7 lesson).
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import (
        INCR_SPLIT_MOD,
        build_dedup_index,
        probe_dedup_index,
    )

    docs_tbl = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    idx_dir = f"/tmp/bpc_bench_idx_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_dedup_index(
        docs_tbl.filter(F.col("doc_id") % INCR_SPLIT_MOD != 0), idx_dir
    )
    probe_batch = docs_tbl.filter(
        F.col("doc_id") % INCR_SPLIT_MOD == 0
    )

    def _probe():
        return probe_dedup_index(spark, probe_batch, idx_dir).agg(
            F.bit_xor(
                F.xxhash64("doc_id", "exact_dup_of", "near_dup_of", "keep")
            )
        ).collect()

    # warm pass (JIT, python workers, page cache) -- recorded, not used.
    # The SUITE queries get the same treatment as extraction: a pandas-
    # UDF query's first call pays ~15-20 s of python-worker spawn +
    # plan compilation that the steady state never sees (r3 diagnosed:
    # dedup_embedding_lsh_pairs reported 9.8 s from cold-inflated
    # medians vs ~4-6 s warm), so all timed samples are warm-state.
    n_out, warm = _timed(lambda: extract(docs, "ArticleExtractor").count())
    extract_staged(docs, "ArticleExtractor").count()
    _balanced_count()
    _run_partitioned_fresh()
    _probe()
    for name in SUITE:
        qs[name](spark, SF_DIR).count()

    samples: dict[str, list] = {}
    ratios: list[float] = []
    for _ in range(N_PASSES):
        _, t_art = _timed(lambda: extract(docs, "ArticleExtractor").count())
        samples.setdefault("extract_article", []).append(t_art)
        _, t = _timed(lambda: extract(docs, "DefaultExtractor").count())
        samples.setdefault("extract_default", []).append(t)
        _, t_staged = _timed(
            lambda: extract_staged(docs, "ArticleExtractor").count()
        )
        samples.setdefault("extract_article_staged", []).append(t_staged)
        ratios.append(t_staged / t_art)  # paired within the pass
        # skew-routing path (r6: per-round regression tracking instead
        # of ad-hoc BASELINE.md measurements).  This corpus has no
        # giant-doc stragglers, so the expected steady state is
        # "moderately slower than plain" (persist overhead, CLAUDE.md)
        _, t_bal = _timed(_balanced_count)
        samples.setdefault("extract_balanced", []).append(t_bal)
        # resumable partitioned loop, fresh run (single scan + bucketed
        # dynamic-partition-overwrite write + metric commits)
        _, t_rp = _timed(_run_partitioned_fresh)
        samples.setdefault("run_partitioned", []).append(t_rp)
        _, t_probe = _timed(_probe)
        samples.setdefault("dedup_index_probe", []).append(t_probe)
        for name in SUITE:
            _, t = _timed(lambda name=name: qs[name](spark, SF_DIR).count())
            samples.setdefault(name, []).append(t)

    queries = {
        name: round(statistics.median(xs), 3) for name, xs in samples.items()
    }
    queries["extract_article_warmup"] = round(warm, 3)
    headline = queries["extract_article"]

    # staged-vs-prod at 3x corpus: single-shot probe of how the ratio
    # moves with size.  Measured finding: it does NOT amortize -- the
    # staged overhead is dominated by the Arrow bridge's per-cell
    # writes (proportional to block rows), not fixed latency; see
    # operators/fusion.py for the passthrough experiment
    corpus3 = _materialize_corpus(spark, sf, n_docs * 3)
    docs3 = read_interleaved(spark, corpus3)
    extract(docs3, "ArticleExtractor").count()  # warm the bigger scan
    _, p3 = _timed(lambda: extract(docs3, "ArticleExtractor").count())
    _, s3 = _timed(lambda: extract_staged(docs3, "ArticleExtractor").count())

    shutil.rmtree(rp_dir, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    return {
        "metric": "article_extract_wall_sec",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "docs_out": n_out,
        "cpus": CPUS,
        "protocol": f"median of {N_PASSES} interleaved passes, all-warm",
        # full per-pass samples: medians hide cold-start/GC outliers,
        # and r3's dedup_embedding_lsh_pairs doc-vs-bench split (9.8 s
        # reported vs ~4 s warm) was undiagnosable without these
        "samples": {k: [round(x, 3) for x in xs] for k, xs in samples.items()},
        "staged_over_prod": round(statistics.median(ratios), 3),
        "staged_over_prod_3x_docs": round(s3 / p3, 3),
    }


def run_extract_only(master: str, n_docs: int, corpus: str) -> dict:
    from boilerpipe_coffee_spark.operators import extract
    from boilerpipe_coffee_spark.plans import get_spark
    from boilerpipe_coffee_spark.sources import read_interleaved

    spark = get_spark("bpc-scaling", master=master, extra_conf=_BENCH_CONF)
    docs = read_interleaved(spark, corpus)
    extract(docs, "ArticleExtractor").count()  # warm (JIT, python workers)
    t0 = time.time()
    extract(docs, "ArticleExtractor").count()
    wall = time.time() - t0
    spark.stop()
    return {"master": master, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_scaling(n_docs: int, cores_pair=(8, 32), cooldown: int = 0) -> dict:
    """Same job, same input, local[8] vs local[32] (the sandbox stand-in
    for N vs 4N executors)."""
    sf = _sf_from_dir(SF_DIR)
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark("bpc-corpus", master=f"local[{CPUS}]", extra_conf=_BENCH_CONF)
    corpus = _materialize_corpus(spark, sf, n_docs)
    spark.stop()

    # the sandbox shows large run-to-run variance (turbo/thermal/
    # neighbors), so interleave 3 runs per core count and use medians.
    # --cooldown N sleeps between samples: sustained back-to-back
    # samples visibly throttle this host (observed 74% swing between
    # adjacent local[8] samples), which deflates the hi-core side of
    # the ratio; a thermal soak pause measures the steady state
    # instead of the throttle transient.
    lo, hi = cores_pair
    samples: dict[str, list] = {f"local[{lo}]": [], f"local[{hi}]": []}
    for _ in range(3):
        for cores in cores_pair:
            if cooldown:
                time.sleep(cooldown)
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--extract-only",
                    "--master",
                    f"local[{cores}]",
                    "--docs",
                    str(n_docs),
                    "--corpus",
                    corpus,
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            samples[f"local[{cores}]"].append(
                json.loads(out.stdout.strip().splitlines()[-1])["docs_per_sec"]
            )
    import statistics

    t_lo = statistics.median(samples[f"local[{lo}]"])
    t_hi = statistics.median(samples[f"local[{hi}]"])
    return {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round((t_hi / t_lo) / (hi / lo), 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "sf": sf,
        f"local[{lo}]": {"docs_per_sec_median": t_lo,
                         "samples": samples[f"local[{lo}]"]},
        f"local[{hi}]": {"docs_per_sec_median": t_hi,
                         "samples": samples[f"local[{hi}]"]},
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument(
        "--docs",
        type=int,
        default=int(DOCS_PER_SF * _sf_from_dir(SF_DIR)),
    )
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--cores", default="8,32",
                    help="N,4N core counts for --scaling")
    ap.add_argument("--cooldown", type=int, default=0,
                    help="seconds of thermal soak between scaling samples")
    args = ap.parse_args()

    if args.extract_only:
        print(json.dumps(run_extract_only(args.master, args.docs, args.corpus)))
    elif args.scaling:
        # 3x the headline size so per-run wall time amortizes fixed
        # startup (JIT, python worker fork) at both core counts
        cores_pair = tuple(int(c) for c in args.cores.split(","))
        print(json.dumps(run_scaling(args.docs * 3, cores_pair,
                                     cooldown=args.cooldown)))
    else:
        print(json.dumps(run_bench()))
