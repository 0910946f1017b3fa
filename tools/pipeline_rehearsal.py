"""Composed-pipeline scale rehearsal (round 7, VERDICT r6 task 1).

The r6 operator ladder measured each dedup/packing family ALONE up to
500k docs; this tool runs the COMPOSED `jobs/run_pipeline.py` job --
extract -> features -> quality gate -> exact dedup -> near-dup
components (reliable checkpoints) -> PII scrub -> bucketed training
write -> chunks -> packed sequences -> dedup index -- on a 500k-doc
rehearsal corpus in ONE process, so the stage interactions
(checkpoint pressure + prefix sums + bucketed writes in one job) are
exercised together, with per-stage wall clock from the job's own
stage_sec instrumentation.

Protocol:
1. Generate the testdata-shaped corpus (tools/make_scale_corpus.py,
   documents only) with its _PLANTED.json ground-truth sidecar.
2. Wrap each doc as a minimal one-paragraph interleaved HTML doc
   (columnar, distributed) -- extraction runs for real, on content
   that reassembles to exactly the rehearsal text.
3. Run the job as a subprocess (PYSPARK_SUBMIT_ARGS sets driver
   memory -- the plain-python launch would otherwise get the 1g
   default that OOMed the r6 sf10 verify join).
4. Assert keep-set invariants over the materialized outputs:
   gates hold row-by-row, content hashes are unique, chunk and
   packed-bin counts equal their closed forms, and the planted
   near-dup pairs are (mostly) collapsed -- with the residual
   both-kept count reported against the known LSH recall.

Usage:
    python tools/pipeline_rehearsal.py [--docs 500000] [--base /tmp/scale_ppl]
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


def make_corpus(base: str, n_docs: int) -> str:
    from make_scale_corpus import corpus_current, write_corpus

    d = os.path.join(base, f"docs{n_docs}")
    if not corpus_current(d):
        # embeddings are not consumed by the pipeline job; keep the
        # vector side tiny so corpus generation stays doc-bound
        write_corpus(d, n_docs, 100)
        print(json.dumps({"generated": d, "docs": n_docs}), flush=True)
    return d


def wrap_interleaved(corpus_dir: str, out_dir: str) -> None:
    """documents.parquet -> interleaved table: one text span of
    minimal HTML per doc.  Columnar (concat + struct), no UDF; the
    doc text re-emerges verbatim from extraction so every downstream
    stage sees exactly the rehearsal distribution."""
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from boilerpipe_coffee_spark.plans import get_spark

    spark = get_spark(app_name="ppl-rehearsal-wrap")
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(
                        F.lit("<html><body><p>"),
                        F.col("text"),
                        F.lit("</p></body></html>"),
                    ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).cast("int").alias("offset"),
                )
            ).alias("spans"),
        ).write.mode("overwrite").parquet(out_dir)
    )
    spark.stop()


def run_job(in_dir: str, out_dir: str, ckpt_dir: str, buckets: int) -> dict:
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
        "--checkpoint-dir", ckpt_dir,
        "--drop-bottom-quality-pct", "5",
        "--emit-chunks", "--pack-sequences", "--scrub-pii",
        "--emit-dedup-index",
    ]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=str(REPO), capture_output=True, text=True, env=env,
        timeout=7200,
    )
    wall = round(time.time() - t0, 1)
    lines = [
        l for l in proc.stdout.strip().splitlines() if l.startswith("{")
    ]
    if not lines:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"job failed rc={proc.returncode}")
    summary = json.loads(lines[-1])
    summary["job_wall_sec"] = wall
    return summary


def check_invariants(
    corpus_dir: str, out_dir: str, summary: dict
) -> dict:
    import duckdb

    from boilerpipe_coffee_spark.operators.textstats import CONTEXT_LEN
    from make_scale_corpus import read_planted

    con = duckdb.connect()
    training = f"read_parquet('{out_dir}/training/*.parquet')"
    inv: dict = {}
    # with --scrub-dup-spans on, n_tokens is POST-splice; the 30-token
    # floor is a PRE-scrub ADMISSION gate, reconstructable from the
    # dup_span_removed_tokens lineage column
    admission = (
        "n_tokens + coalesce(dup_span_removed_tokens, 0)"
        if "dup_span_scrubbed_docs" in summary
        else "n_tokens"
    )
    row = con.sql(
        f"SELECT count(*), count(DISTINCT content_hash), "
        f"min({admission}), max(dup_bigram_frac) FROM {training}"
    ).fetchone()
    inv["kept_rows"] = row[0]
    inv["kept_matches_summary"] = row[0] == summary["kept"]
    inv["content_hash_unique"] = row[1] == row[0]
    inv["min_tokens_ok"] = row[2] >= 30
    inv["max_dup_bigram_ok"] = row[3] <= 0.9
    # chunk closed form: sum(ceil(n_tokens / CONTEXT_LEN)) over kept
    n_chunks_expect = con.sql(
        f"SELECT sum(CAST(ceil(n_tokens / {float(CONTEXT_LEN)}) AS BIGINT)) "
        f"FROM {training}"
    ).fetchone()[0]
    inv["chunks_match_closed_form"] = summary.get("chunks") == n_chunks_expect
    # packed closed form: ceil(total_tokens / CONTEXT_LEN) bins
    total_tokens = con.sql(
        f"SELECT sum(n_tokens) FROM {training}"
    ).fetchone()[0]
    bins_expect = -(-int(total_tokens) // CONTEXT_LEN)
    inv["packed_bins_match_closed_form"] = (
        summary.get("packed_bins") == bins_expect
    )
    inv["total_training_tokens"] = int(total_tokens)
    # planted near-dup pairs: at most one member of each pair should
    # survive where BOTH members were exact-kept candidates; residual
    # both-kept = LSH misses (bounded by the measured banding recall)
    kept_ids = {
        int(r[0]) for r in con.sql(
            f"SELECT doc_id FROM {training}"
        ).fetchall()
    }
    pairs = [tuple(p) for p in read_planted(corpus_dir)["doc_pairs"]]
    both = sum(1 for s, t in pairs if s in kept_ids and t in kept_ids)
    inv["planted_pairs"] = len(pairs)
    inv["planted_both_kept"] = both
    inv["planted_collapse_rate"] = (
        round(1 - both / len(pairs), 4) if pairs else None
    )
    con.close()
    return inv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--base", default="/tmp/scale_ppl")
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    corpus = make_corpus(args.base, args.docs)
    interleaved = os.path.join(args.base, f"interleaved{args.docs}")
    wrap_interleaved(corpus, interleaved)
    out = os.path.join(args.base, f"out{args.docs}")
    ckpt = os.path.join(args.base, f"ckpt{args.docs}")
    summary = run_job(interleaved, out, ckpt, args.buckets)
    print(json.dumps({"summary": summary}), flush=True)
    inv = check_invariants(corpus, out, summary)
    print(json.dumps({"invariants": inv}), flush=True)
    bad = [
        k for k, v in inv.items()
        if isinstance(v, bool) and not v
    ]
    print(json.dumps({"bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
