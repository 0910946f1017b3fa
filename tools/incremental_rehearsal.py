"""Incremental-ingest rehearsal at scale (round 7).

`jobs/run_pipeline.py --incremental` models the production recurring-
crawl shape: dedup each new batch against the EXISTING corpus's
materialized index before spending gates/near-dup work on it.  The
mode has an sf0.001 e2e test; this tool exercises it at rehearsal
scale against the index the composed 500k run built
(tools/pipeline_rehearsal.py --emit-dedup-index), with per-class
ground truth the small test cannot provide.

Protocol:
1. Build a deterministic "v2 crawl" batch from the v1 output:
   - E exact re-fetches: text sampled verbatim from v1's kept
     training table (same bytes the index hashed -- a crawler
     re-fetching an unchanged page),
   - N near-dup re-fetches: v1 kept docs with two token positions
     rewritten (the same edit shape make_scale_corpus plants, so the
     measured banding recall is comparable),
   - X novel docs: make_documents with a disjoint seed (carrying its
     own internally-planted near-dups, like a real crawl).
   Class is encoded in the doc_id prefix (e/n/x) so decisions can be
   graded per class.
2. Wrap interleaved and run the FULL job with --incremental
   <v1 out>: extraction runs for real, the probe runs inside the job.
3. Grade: every exact re-fetch MUST be caught (md5 probe is
   deterministic); banding recall on the planted nears is reported
   (and asserted >= 0.75 -- (8,4) direct-match recall at this edit
   shape measured ~0.84 at sf10); novel false-positive counts are
   reported; no 'e'-prefixed doc may reach the training table.

Usage:
    python tools/incremental_rehearsal.py \
        [--prior-out /tmp/scale_ppl/out500000] [--base /tmp/scale_incr]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

E_EXACT = 10_000
N_NEAR = 10_000
X_NOVEL = 30_000
NOVEL_SEED = 777
PERTURB_SEED = 778


def _set_sizes(e: int, n: int, x: int) -> None:
    global E_EXACT, N_NEAR, X_NOVEL
    E_EXACT, N_NEAR, X_NOVEL = e, n, x


def build_batch(prior_out: str, base: str, tag: str = "") -> str:
    """Write the v2 batch as <base>/docs/documents.parquet; returns
    the corpus dir.  Driver-side pandas is fine here -- this is
    one-time corpus GENERATION, not an operator."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from make_scale_corpus import VOCAB, make_documents

    d = os.path.join(base, "docs")
    marker = os.path.join(d, "documents.parquet")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)

    con = duckdb.connect()
    src = con.sql(
        "SELECT doc_id, text FROM read_parquet('"
        + os.path.join(prior_out, "training", "*.parquet")
        + "') ORDER BY doc_id LIMIT "
        + str(E_EXACT + N_NEAR)
    ).df()
    assert len(src) == E_EXACT + N_NEAR, len(src)

    ids, texts = [], []
    for i in range(E_EXACT):
        ids.append(f"e{tag}{i:05d}")
        texts.append(src["text"][i])
    rng = np.random.default_rng(PERTURB_SEED)
    vocab = np.array(VOCAB)
    for i in range(N_NEAR):
        words = src["text"][E_EXACT + i].split()
        assert len(words) >= 8  # kept docs passed the 30-token gate
        words[2] = vocab[rng.integers(0, len(vocab))]
        words[-3] = vocab[rng.integers(0, len(vocab))]
        ids.append(f"n{tag}{i:05d}")
        texts.append(" ".join(words))
    novel, _ = make_documents(X_NOVEL, seed=NOVEL_SEED)
    for i, t in enumerate(novel.column("text").to_pylist()):
        ids.append(f"x{tag}{i:05d}")
        texts.append(t)

    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
        marker,
    )
    sources = {"e": [], "n": []}
    for i in range(E_EXACT):
        sources["e"].append(str(src["doc_id"][i]))
    for i in range(N_NEAR):
        sources["n"].append(str(src["doc_id"][E_EXACT + i]))
    with open(os.path.join(d, "_SOURCES.json"), "w") as f:
        json.dump(sources, f)
    print(json.dumps({"generated": d, "batch": len(ids)}), flush=True)
    return d


def run_job(in_dir: str, out_dir: str, ckpt: str, prior_out: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--driver-memory 12g --conf spark.sql.shuffle.partitions=128 "
        "--conf spark.cleaner.periodicGC.interval=30s pyspark-shell"
    )
    cmd = [
        sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
        "--input", in_dir, "--output", out_dir, "--buckets", "8",
        "--checkpoint-dir", ckpt, "--incremental", prior_out,
    ]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=str(REPO), capture_output=True, text=True, env=env,
        timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"job failed rc={proc.returncode}")
    summary = json.loads(lines[-1])
    summary["job_wall_sec"] = wall
    return summary


def grade(batch_dir: str, out_dir: str, prior_out: str, summary: dict):
    """Per-class decision grades via a direct probe (same operator the
    job calls; text round-trips extraction verbatim, asserted by the
    composed rehearsal), plus training-table class assertions."""
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import probe_dedup_index
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(app_name="incr-rehearsal-grade")
    batch = spark.read.parquet(os.path.join(batch_dir, "documents.parquet"))
    dec = probe_dedup_index(
        spark, batch, os.path.join(prior_out, "dedup_index")
    ).withColumn("cls", F.substring("doc_id", 1, 1))
    per = {
        r["cls"]: r.asDict()
        for r in dec.groupBy("cls").agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("exact_dup_of") != F.lit("-1"), 1).otherwise(0)
            ).alias("exact_hits"),
            F.sum(
                F.when(
                    (F.col("exact_dup_of") == F.lit("-1"))
                    & (F.col("near_dup_of") != F.lit("-1")),
                    1,
                ).otherwise(0)
            ).alias("near_hits"),
        ).collect()
    }
    kept_cls = {
        r["cls"]: r["n"]
        for r in spark.read.parquet(os.path.join(out_dir, "training"))
        .withColumn("cls", F.substring("doc_id", 1, 1))
        .groupBy("cls")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    spark.stop()

    near_recall = per["n"]["near_hits"] / N_NEAR
    inv = {
        "per_class": per,
        "kept_by_class": kept_cls,
        "exact_all_caught": per["e"]["exact_hits"] == E_EXACT,
        "near_recall": round(near_recall, 4),
        "near_recall_ok": near_recall >= 0.75,
        "novel_exact_fp_zero": per["x"]["exact_hits"] == 0,
        "novel_near_fp": per["x"]["near_hits"],
        "no_exact_refetch_kept": kept_cls.get("e", 0) == 0,
        # probe classes are disjoint, so the job's counters must
        # equal the graded sums exactly
        "job_counts_consistent": (
            summary["incr_exact_dup"]
            == sum(p["exact_hits"] for p in per.values())
            and summary["incr_near_dup"]
            == sum(p["near_hits"] for p in per.values())
        ),
    }
    return inv


def roll_index(prior_out: str, out_dir: str, base: str) -> dict:
    """Measure the index roll-forward at scale: update(prior, batch
    keepers) vs a fresh build over the union corpus, with checksum
    equality asserted Spark-side (bit_xor of row hashes -- the tables
    are millions of rows; never collect them)."""
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import (
        build_dedup_index,
        update_dedup_index,
    )
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(app_name="incr-rehearsal-roll")
    v1_docs = spark.read.parquet(
        os.path.join(prior_out, "training")
    ).select("doc_id", "text")
    batch = spark.read.parquet(os.path.join(out_dir, "training")).select(
        "doc_id", "text"
    )

    rec = {}
    # the composed run's index predates band_counts; rebuild once
    # (this is also the honest "what a rebuild costs" yardstick)
    v1_idx = os.path.join(base, "idx_v1")
    t0 = time.time()
    meta1 = build_dedup_index(v1_docs, v1_idx)
    rec["v1_rebuild_sec"] = round(time.time() - t0, 2)

    v2_idx = os.path.join(base, "idx_v2")
    t0 = time.time()
    meta2 = update_dedup_index(batch, v1_idx, v2_idx)
    rec["update_sec"] = round(time.time() - t0, 2)

    fresh_idx = os.path.join(base, "idx_fresh")
    t0 = time.time()
    build_dedup_index(
        v1_docs.unionByName(batch), fresh_idx,
        banding=tuple(meta1["banding"]),
    )
    rec["fresh_union_build_sec"] = round(time.time() - t0, 2)

    def checksum(d: str, sub: str):
        df = spark.read.parquet(os.path.join(d, sub))
        r = df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")
        ).collect()[0]
        return int(r["n"]), int(r["x"] or 0)

    for sub in ("hashes", "bands", "band_counts"):
        got, want = checksum(v2_idx, sub), checksum(fresh_idx, sub)
        rec[f"{sub}_equal"] = got == want
        rec[f"{sub}_rows"] = got[0]
    rec["n_docs_v2"] = meta2["n_docs"]
    rec["banding_stale"] = meta2["banding_stale"]
    spark.stop()
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior-out", default="/tmp/scale_ppl/out500000")
    ap.add_argument("--base", default="/tmp/scale_incr")
    ap.add_argument("--exact", type=int, default=E_EXACT)
    ap.add_argument("--near", type=int, default=N_NEAR)
    ap.add_argument("--novel", type=int, default=X_NOVEL)
    ap.add_argument("--roll-index", action="store_true")
    args = ap.parse_args()
    _set_sizes(args.exact, args.near, args.novel)

    batch = build_batch(args.prior_out, args.base)
    interleaved = os.path.join(args.base, "interleaved")
    from pipeline_rehearsal import wrap_interleaved

    wrap_interleaved(batch, interleaved)
    out = os.path.join(args.base, "out")
    summary = run_job(
        interleaved, out, os.path.join(args.base, "ckpt"), args.prior_out
    )
    print(json.dumps({"summary": summary}), flush=True)
    inv = grade(batch, out, args.prior_out, summary)
    print(json.dumps({"invariants": inv}), flush=True)
    bad = [k for k, v in inv.items() if isinstance(v, bool) and not v]
    if args.roll_index:
        roll = roll_index(args.prior_out, out, args.base)
        print(json.dumps({"roll_index": roll}), flush=True)
        bad += [
            k for k, v in roll.items()
            if isinstance(v, bool) and k.endswith("_equal") and not v
        ]
    print(json.dumps({"bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
