"""Full production-lifecycle rehearsal (round 8, VERDICT r7 task 1).

Round 7 rehearsed each capability separately: the composed 500k build
(without the dup-span gate), the incremental probe, and the index
roll.  A real operator runs them as ONE chain, repeatedly:

  v1: composed build at 500k with EVERY gate on -- quality gate,
      exact dedup, near-dup components (reliable checkpoints),
      cross-doc dup-span gate, PII scrub, chunks, packed sequences,
      dedup index.
  v2: the next crawl through the SAME job with --incremental v1 and
      the same full gate set; --emit-dedup-index ROLLS the index
      forward (update_dedup_index) instead of rebuilding.

This tool runs that chain and asserts the two composition claims the
per-capability rehearsals could not:

  1. KEEP-SET EQUIVALENCE: the v2 job's materialized training table
     equals the operator-level recomputation of its decisions -- the
     same shared operators (probe_dedup_index, quality_gate,
     near_dup_keep, dup_span_frac_df) invoked directly in one
     session, in the documented stage order.  The operators' own
     correctness is oracle-gated elsewhere; this pins the job's
     WIRING (probe persist + components checkpoints + gate order in
     one process).
  2. INDEX-ROLL EQUIVALENCE: the v2 index the job rolled forward
     checksum-equals a fresh build over (v1 keepers UNION v2
     keepers) at the frozen banding -- bit_xor(xxhash64) per table,
     never collected.

The dup-span gate earns its slot in the chain: planted near-dup
pairs that LSH MISSES (both members kept) are near-identical docs,
so both carry dup_frac ~= 1 and the span gate sweeps them -- the
per-phase report includes planted both-kept before/after evidence
via pipeline_rehearsal.check_invariants.

Usage:
    python tools/lifecycle_rehearsal.py [--docs 500000]
        [--base /tmp/scale_lifecycle] [--exact 10000] [--near 10000]
        [--novel 30000] [--dup-span-frac 0.6]
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


def run_job(
    in_dir: str,
    out_dir: str,
    ckpt: str,
    buckets: int,
    dup_span_frac: float,
    incremental: "str | None" = None,
    scrub_dup_spans: bool = False,
) -> dict:
    """One composed run_pipeline invocation with EVERY stage on."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--driver-memory 12g --conf spark.sql.shuffle.partitions=128 "
        "--conf spark.cleaner.periodicGC.interval=30s pyspark-shell"
    )
    cmd = [
        sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
        "--input", in_dir, "--output", out_dir,
        "--buckets", str(buckets),
        "--checkpoint-dir", ckpt,
        "--drop-bottom-quality-pct", "5",
        "--max-dup-span-frac", str(dup_span_frac),
        "--scrub-pii",
        "--emit-chunks", "--pack-sequences", "--emit-dedup-index",
    ]
    if scrub_dup_spans:
        cmd += ["--scrub-dup-spans"]
    if incremental:
        cmd += ["--incremental", incremental]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=str(REPO), capture_output=True, text=True, env=env,
        timeout=7200,
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


BOILER_SPAN_TOKENS = 20
BOILER_FILLER = 60


def augment_boiler(
    src_dir: str,
    dst_dir: str,
    n_pairs: int,
    reuse_spans: "list[str]",
    seed: int,
    tag: "str | None" = None,
) -> "list[str]":
    """Append boilerplate-bearing docs to <src_dir>/documents.parquet
    -> <dst_dir>/documents.parquet (doc_id + text columns only -- all
    consumers select just those).  ``n_pairs`` pairs share a fresh
    20-token span each (cross-doc duplicated INSIDE this version ->
    they enter the version's dup_grams list and get spliced); each
    span in ``reuse_spans`` goes into ONE new doc (duplicated only
    against PRIOR versions -> spliced purely via the index's rolled
    list, the replay path).  Fillers draw from the corpus VOCAB so the
    quality gate sees the rehearsal distribution.  ``tag=None`` uses
    int ids past the corpus range (v1); a tag makes 'b<tag>...' string
    ids (crawl batches, graded as their own class)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from make_scale_corpus import VOCAB

    rng = np.random.RandomState(seed)

    def words(n):
        return [VOCAB[i] for i in rng.randint(0, len(VOCAB), n)]

    texts, spans = [], []
    for i in range(n_pairs):
        span = " ".join(words(BOILER_SPAN_TOKENS))
        spans.append(span)
        for _m in range(2):
            filler = words(BOILER_FILLER)
            half = BOILER_FILLER // 2
            texts.append(
                " ".join(filler[:half])
                + f" {span} "
                + " ".join(filler[half:])
            )
    for span in reuse_spans:
        filler = words(BOILER_FILLER)
        half = BOILER_FILLER // 2
        texts.append(
            " ".join(filler[:half]) + f" {span} " + " ".join(filler[half:])
        )

    src = pq.read_table(
        os.path.join(src_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    if tag is None:
        ids = pa.array(
            [10_000_000 + k for k in range(len(texts))],
            src.schema.field("doc_id").type,
        )
    else:
        ids = pa.array([f"b{tag}{k:05d}" for k in range(len(texts))])
    add = pa.table({"doc_id": ids, "text": pa.array(texts)})
    os.makedirs(dst_dir, exist_ok=True)
    pq.write_table(
        pa.concat_tables([src, add]),
        os.path.join(dst_dir, "documents.parquet"),
    )
    return spans


def expected_keep_set(
    spark, v2_out: str, v1_out: str, dup_span_frac: float
) -> "set[str]":
    """Operator-level recomputation of the v2 job's keep decisions:
    the same shared operators, invoked directly, in the documented
    stage order (probe -> quality gate -> exact -> near-dup ->
    dup-span).  Scrub does not change membership (it rewrites text
    after the last gate)."""
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import probe_dedup_index
    from boilerpipe_coffee_spark.operators.pretrain import (
        content_features,
        near_dup_keep,
        quality_gate,
    )
    from boilerpipe_coffee_spark.operators.textstats import dup_span_frac_df

    extracted = spark.read.parquet(os.path.join(v2_out, "extract", "data"))
    features = content_features(extracted)

    decisions = probe_dedup_index(
        spark,
        features.select("doc_id", "text"),
        os.path.join(v1_out, "dedup_index"),
    )
    features = features.join(
        decisions.filter(F.col("keep")).select("doc_id"), "doc_id",
        "left_semi",
    ).persist()

    features, _thr = quality_gate(features, 5)
    features = features.drop("quality", "passes_quality")
    exact_kept = features.filter(F.col("keep")).count()
    training = near_dup_keep(features, n_docs=exact_kept).filter(
        F.col("keep_final")
    )
    flagged = (
        dup_span_frac_df(training.select("doc_id", "text"))
        .filter(F.col("dup_frac") > dup_span_frac)
        .select("doc_id")
    )
    keep = {
        r["doc_id"]
        for r in training.join(flagged, "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    }
    features.unpersist()
    return keep


def check_index_roll(
    spark, all_outs: "list[str]", rolled_out: str, base: str
) -> dict:
    """The index the JOB rolled forward must checksum-equal a fresh
    build over EVERY version's keepers so far (the whole corpus, not
    just the last two batches) at the frozen banding."""
    import functools

    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.operators.dedup import (
        DEDUP_INDEX_META,
        build_dedup_index,
    )

    with open(
        os.path.join(all_outs[0], "dedup_index", DEDUP_INDEX_META)
    ) as f:
        v1_meta = json.load(f)
    union_docs = functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(os.path.join(o, "training")).select(
                "doc_id", "text"
            )
            for o in all_outs
        ],
    )
    fresh_dir = os.path.join(base, "idx_fresh_union")
    t0 = time.time()
    build_dedup_index(
        union_docs, fresh_dir,
        banding=tuple(v1_meta["banding"]),
        scrubbed=v1_meta.get("scrubbed", False),
    )
    rec: dict = {"fresh_union_build_sec": round(time.time() - t0, 2)}

    def checksum(d: str, sub: str):
        df = spark.read.parquet(os.path.join(d, sub))
        r = df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")
        ).collect()[0]
        return int(r["n"]), int(r["x"] or 0)

    rolled = os.path.join(rolled_out, "dedup_index")
    for sub in ("hashes", "bands", "band_counts"):
        got, want = checksum(rolled, sub), checksum(fresh_dir, sub)
        rec[f"{sub}_equal"] = got == want
        rec[f"{sub}_rows"] = got[0]
    with open(os.path.join(rolled, DEDUP_INDEX_META)) as f:
        v2_meta = json.load(f)
    rec["n_docs_v2"] = v2_meta["n_docs"]
    rec["banding_stale"] = v2_meta["banding_stale"]
    rec["scrubbed"] = v2_meta.get("scrubbed", False)
    rec["dup_span_scrubbed"] = v2_meta.get("dup_span_scrubbed", False)
    if rec["dup_span_scrubbed"]:
        # the rolled boilerplate list must equal its independent
        # recomputation: the UNION over versions of dup_grams_df on
        # each version's PRE-splice keep-set text (extract output
        # filtered to that version's training ids -- gates drop rows
        # but never rewrite text, and the splice runs after the gram
        # stage, so this replays exactly what the job hashed)
        from boilerpipe_coffee_spark.operators.pretrain import (
            content_features,
        )
        from boilerpipe_coffee_spark.operators.textstats import (
            dup_grams_df,
        )

        per_version = []
        for o in all_outs:
            keep_ids = spark.read.parquet(
                os.path.join(o, "training")
            ).select("doc_id")
            # extract output is span-structured; content_features is
            # the job's own spans -> flat text derivation
            pre = (
                content_features(
                    spark.read.parquet(os.path.join(o, "extract", "data"))
                )
                .select("doc_id", "text")
                .join(keep_ids, "doc_id", "left_semi")
            )
            per_version.append(dup_grams_df(pre))
        want_g = functools.reduce(
            lambda a, b: a.unionByName(b), per_version
        ).distinct()
        w = want_g.select(F.xxhash64("g").alias("h")).agg(
            F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")
        ).collect()[0]
        got_g = checksum(rolled, "dup_grams")
        rec["dup_grams_equal"] = got_g == (int(w["n"]), int(w["x"] or 0))
        rec["dup_grams_rows"] = got_g[0]
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--base", default="/tmp/scale_lifecycle")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--exact", type=int, default=10_000)
    ap.add_argument("--near", type=int, default=10_000)
    ap.add_argument("--novel", type=int, default=30_000)
    ap.add_argument("--dup-span-frac", type=float, default=0.6)
    ap.add_argument("--crawls", type=int, default=2,
                    help="number of incremental crawls after v1")
    ap.add_argument("--scrub-dup-spans", action="store_true",
                    help="add the byte-preserving dup-span splice to "
                    "every run in the chain (v1 build + each crawl); "
                    "the index-roll check then also verifies the "
                    "rolled dup_grams boilerplate list against an "
                    "independent recomputation")
    args = ap.parse_args()

    import incremental_rehearsal as incr
    from pipeline_rehearsal import (
        check_invariants,
        make_corpus,
        wrap_interleaved,
    )

    bad: list[str] = []

    # ---- phase A: v1 composed build, every gate on ----
    corpus = make_corpus(args.base, args.docs)
    wrap_src = corpus
    boiler_spans: "list[str]" = []
    n_pairs_v1 = 100
    if args.scrub_dup_spans:
        # plant boilerplate PAIRS (shared 20-token span, unique
        # fillers): whole-doc near-dups are collapsed by LSH and
        # span-heavy docs by the drop gate, so the splice would
        # otherwise see an organically-empty keep-set
        aug = os.path.join(args.base, f"aug{args.docs}")
        boiler_spans = augment_boiler(
            corpus, aug, n_pairs=n_pairs_v1, reuse_spans=[], seed=4242
        )
        wrap_src = aug
    v1_in = os.path.join(args.base, f"interleaved{args.docs}")
    wrap_interleaved(wrap_src, v1_in)
    v1_out = os.path.join(args.base, f"v1_out{args.docs}")
    s1 = run_job(
        v1_in, v1_out, os.path.join(args.base, "ckpt_v1"),
        args.buckets, args.dup_span_frac,
        scrub_dup_spans=args.scrub_dup_spans,
    )
    print(json.dumps({"v1_summary": s1}), flush=True)
    inv1 = check_invariants(corpus, v1_out, s1)
    if args.scrub_dup_spans:
        # at least half the planted boiler docs must reach the splice
        # (gates may drop a few) -- 0 scrubbed docs would mean the
        # chain never exercised the stage
        inv1["boiler_scrubbed_ok"] = (
            s1["dup_span_scrubbed_docs"] >= n_pairs_v1
        )
    print(json.dumps({"v1_invariants": inv1}), flush=True)
    bad += [f"v1:{k}" for k, v in inv1.items() if isinstance(v, bool) and not v]

    # ---- phases B..: repeated incremental crawls, each probing the
    # PRIOR version's index through the same fully-gated job and
    # rolling it forward; each crawl gets both equivalence checks ----
    from boilerpipe_coffee_spark.plans import get_spark

    incr._set_sizes(args.exact, args.near, args.novel)
    prior_out = v1_out
    all_outs = [v1_out]
    for v in range(2, args.crawls + 2):
        crawl_base = os.path.join(args.base, f"crawl_v{v}")
        # per-crawl novel/perturb seeds and an id tag: crawl v3's
        # novel docs must be genuinely new (a frozen seed would make
        # them byte-copies of v2's keepers) and ids must not collide
        # across versions in the union corpus
        incr.NOVEL_SEED = 777 + v
        incr.PERTURB_SEED = 778 + 100 * v
        batch = incr.build_batch(prior_out, crawl_base, tag=str(v))
        if args.scrub_dup_spans:
            # fresh pairs (batch-internal dups -> enter the rolled
            # list) + one doc per PRIOR span (duplicated only against
            # earlier versions -> spliced purely via the index's
            # rolled list: the replay path)
            augb = os.path.join(crawl_base, "docs_aug")
            new_spans = augment_boiler(
                batch, augb, n_pairs=25,
                reuse_spans=boiler_spans[:25],
                seed=4242 + v, tag=str(v),
            )
            boiler_spans = new_spans + boiler_spans
            batch = augb
        vin = os.path.join(crawl_base, "interleaved")
        wrap_interleaved(batch, vin)
        vout = os.path.join(args.base, f"v{v}_out")
        s = run_job(
            vin, vout, os.path.join(crawl_base, "ckpt"),
            8, args.dup_span_frac, incremental=prior_out,
            scrub_dup_spans=args.scrub_dup_spans,
        )
        print(json.dumps({f"v{v}_summary": s}), flush=True)
        g = incr.grade(batch, vout, prior_out, s)
        if args.scrub_dup_spans:
            # 25 fresh pairs + 25 prior-span reuse docs entered; the
            # gates may drop a few, but a near-zero count means the
            # splice/replay path never ran
            g["boiler_scrubbed_ok"] = s["dup_span_scrubbed_docs"] >= 25
        print(json.dumps({f"v{v}_grades": g}), flush=True)
        bad += [
            f"v{v}:{k}" for k, v_ in g.items()
            if isinstance(v_, bool) and not v_
        ]

        spark = get_spark(app_name=f"lifecycle-check-v{v}")
        want = expected_keep_set(spark, vout, prior_out, args.dup_span_frac)
        got = {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(vout, "training"))
            .select("doc_id")
            .collect()
        }
        keep_eq = {
            "keep_set_equal": got == want,
            "kept": len(got),
            "only_in_job": sorted(got - want)[:10],
            "only_in_oracle": sorted(want - got)[:10],
        }
        print(json.dumps({f"v{v}_keep_set": keep_eq}), flush=True)
        if not keep_eq["keep_set_equal"]:
            bad.append(f"v{v}_keep_set_equal")

        all_outs.append(vout)
        roll = check_index_roll(spark, all_outs, vout, crawl_base)
        print(json.dumps({f"v{v}_index_roll": roll}), flush=True)
        bad += [
            f"v{v}:{k}" for k, v_ in roll.items()
            if isinstance(v_, bool) and k.endswith("_equal") and not v_
        ]
        spark.stop()
        prior_out = vout

    print(json.dumps({"bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
