"""banding_stale epoch rehearsal (round 8, VERDICT r7 task 2).

A long-lived corpus WILL cross a ``minhash_banding`` boundary:
``update_dedup_index`` keeps the banding frozen (probe signatures
only match the index they were banded for) and flags
``banding_stale`` when corpus growth moves the adaptive policy past
the frozen (b, r).  The documented answer is a one-off full rebuild
at the new banding on the next version roll.  This tool rehearses
that epoch at the 10k boundary:

1. v1 index over ~9.2k docs -> policy (6, 3).
2. Roll 500-doc batches forward until n_docs crosses 10k ->
   ``banding_stale: true`` (asserted to fire exactly when the policy
   moves, not before).
3. Probe PLANTED near-dup partners (2-token edits of indexed docs --
   the same edit shape every banding measurement uses) against the
   stale index -> recall_before.
4. Full rebuild at minhash_banding(n) = (8, 4) over the union corpus
   (cost measured) -> flag clears, banding == policy.
5. Probe the same partners against the rebuilt index ->
   recall_after.  (8, 4) trades recall for bounded bucket occupancy
   BY DESIGN, so the assertion is recall_after >= 0.75 -- the same
   floor the incremental rehearsal holds -- not recall_after >=
   recall_before; both numbers and the candidate-volume drop land in
   BASELINE.md.

Usage:
    python tools/banding_epoch_rehearsal.py [--base /tmp/scale_epoch]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

V1_DOCS = 9_200
BATCH = 500
N_PROBE = 1_000
PERTURB_SEED = 779


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/scale_epoch")
    args = ap.parse_args()
    shutil.rmtree(args.base, ignore_errors=True)
    os.makedirs(args.base, exist_ok=True)

    import numpy as np
    from make_scale_corpus import VOCAB, make_documents

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        "--driver-memory 12g --conf spark.sql.shuffle.partitions=32 "
        "pyspark-shell",
    )
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import (
        build_dedup_index,
        minhash_banding,
        probe_dedup_index,
        update_dedup_index,
    )
    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(app_name="banding-epoch")
    rec: dict = {}

    # one deterministic pool: v1 corpus + the roll batches, all novel
    pool, _ = make_documents(V1_DOCS + 4 * BATCH, seed=4242)
    ids = [f"d{i:06d}" for i in range(pool.num_rows)]
    texts = pool.column("text").to_pylist()
    rows = list(zip(ids, texts))
    v1_rows, batches = rows[:V1_DOCS], []
    for i in range(4):
        lo = V1_DOCS + i * BATCH
        batches.append(rows[lo:lo + BATCH])

    v1 = spark.createDataFrame(v1_rows, "doc_id string, text string")
    v1_dir = os.path.join(args.base, "idx_v0")
    t0 = time.time()
    meta = build_dedup_index(v1, v1_dir)
    rec["v1_build_sec"] = round(time.time() - t0, 2)
    rec["v1_banding"] = meta["banding"]
    assert tuple(meta["banding"]) == minhash_banding(V1_DOCS) == (6, 3)

    # planted near-dup partners of INDEXED docs: 2-token edits, the
    # measured edit shape
    rng = np.random.default_rng(PERTURB_SEED)
    vocab = np.array(VOCAB)
    probes = []
    for i in range(N_PROBE):
        words = texts[i].split()
        words[2] = vocab[rng.integers(0, len(vocab))]
        words[-3] = vocab[rng.integers(0, len(vocab))]
        probes.append((f"p{i:05d}", " ".join(words)))
    probe_df = spark.createDataFrame(probes, "doc_id string, text string")

    def near_recall(index_dir: str) -> float:
        dec = probe_dedup_index(spark, probe_df, index_dir)
        hit = dec.filter(
            (F.col("exact_dup_of") == "-1") & (F.col("near_dup_of") != "-1")
        ).count()
        return hit / N_PROBE

    # roll batches until the policy moves past the frozen banding
    prior = v1_dir
    stale_history = []
    t0 = time.time()
    for i, b in enumerate(batches):
        nxt = os.path.join(args.base, f"idx_v{i + 1}")
        bdf = spark.createDataFrame(b, "doc_id string, text string")
        meta = update_dedup_index(bdf, prior, nxt)
        stale_history.append(
            {"n_docs": meta["n_docs"], "stale": meta["banding_stale"]}
        )
        prior = nxt
    rec["roll_4_batches_sec"] = round(time.time() - t0, 2)
    rec["stale_history"] = stale_history
    # the flag must fire exactly when minhash_banding(n) leaves (6,3)
    for h in stale_history:
        want = minhash_banding(h["n_docs"]) != (6, 3)
        assert h["stale"] == want, (h, want)
    assert stale_history[-1]["stale"], "never went stale -- sizes wrong"
    rec["n_docs_final"] = stale_history[-1]["n_docs"]

    rec["recall_stale_6_3"] = round(near_recall(prior), 4)

    # the epoch event: full rebuild at the new policy banding
    union_rows = v1_rows + [r for b in batches for r in b]
    union = spark.createDataFrame(union_rows, "doc_id string, text string")
    rebuilt = os.path.join(args.base, "idx_rebuilt")
    t0 = time.time()
    meta = build_dedup_index(union, rebuilt)
    rec["rebuild_sec"] = round(time.time() - t0, 2)
    rec["rebuilt_banding"] = meta["banding"]
    assert tuple(meta["banding"]) == minhash_banding(meta["n_docs"]) == (8, 4)
    assert "banding_stale" not in meta  # fresh builds are never stale
    # and a subsequent roll off the rebuilt index is NOT stale
    post = spark.createDataFrame(
        [("z00001", "entirely fresh post-epoch document text")],
        "doc_id string, text string",
    )
    meta = update_dedup_index(
        post, rebuilt, os.path.join(args.base, "idx_post")
    )
    rec["post_epoch_stale"] = meta["banding_stale"]
    assert meta["banding_stale"] is False

    rec["recall_rebuilt_8_4"] = round(near_recall(rebuilt), 4)
    rec["recall_floor_ok"] = rec["recall_rebuilt_8_4"] >= 0.75

    # candidate-volume evidence: probe-side band-match rows (the work
    # the verify/groupBy stage downstream of a probe actually pays;
    # raw band-table rows would just measure b*n).  (8,4)'s longer
    # band hashes collide less per band even though it has more bands.
    from boilerpipe_coffee_spark.operators.dedup import (
        DEDUP_INDEX_META,
        _index_tag,
        minhash_bands_df,
    )

    for tag, d in (("stale_6_3", prior), ("rebuilt_8_4", rebuilt)):
        with open(os.path.join(d, DEDUP_INDEX_META)) as f:
            m = json.load(f)
        ex_bands = spark.read.parquet(os.path.join(d, "bands"))
        rec[f"probe_candidates_{tag}"] = (
            minhash_bands_df(probe_df, tuple(m["banding"]))
            .join(ex_bands, "band_key")
            .count()
        )
    spark.stop()
    print(json.dumps(rec), flush=True)
    return 0 if rec["recall_floor_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
