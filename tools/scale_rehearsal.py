"""Scale rehearsal (round 6, VERDICT r5 task 1): run the dedup /
similarity / packing families on a consistent corpus ladder up to sf1
(50k docs / 20k vectors -- 10x the largest committed corpus) with FULL
DuckDB-oracle hash parity at every point, and record the
candidate-ratio / bucket-occupancy stats that turn the 100-TB scale
argument into a measured trend line.

Corpora come from tools/make_scale_corpus.py (deterministic, same
shape as the driver testdata); oracles are regenerated per point
through the SAME banding policies the operators use
(dedup.minhash_banding / similarity.emb_banding), so non-legacy policy
points (5k docs -> 6x3, 50k -> 8x4; 2k vecs -> 6x16, 20k -> 10x24)
are exercised for real, not extrapolated.

Usage:
    python tools/scale_rehearsal.py [--base /tmp/scale] [--ladder
        500:500,5000:2000,50000:20000] [--skip-oracle-over N]

Prints one JSON line per (point, family) and a final summary; paste
the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from driver_sim import _value_hash  # noqa: E402


def _spark():
    from boilerpipe_coffee_spark.plans import get_spark

    return get_spark()


def _compare(sdf, con, sql, t0=None):
    s_cols = sdf.columns
    if t0 is None:
        t0 = time.time()
    s_rows = [tuple(r) for r in sdf.collect()]
    spark_sec = time.time() - t0
    t0 = time.time()
    pdf = con.sql(sql).df()
    oracle_sec = time.time() - t0
    d_cols = list(pdf.columns)
    d_rows = [
        tuple(x.item() if hasattr(x, "item") else x for x in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return {
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": len(s_rows) == len(d_rows)
        and sorted(s_cols) == sorted(d_cols)
        and _value_hash(s_cols, s_rows) == _value_hash(d_cols, d_rows),
        "spark_sec": round(spark_sec, 2),
        "oracle_sec": round(oracle_sec, 2),
    }


def run_point(spark, d: str, n_docs: int, n_vecs: int, skip_oracle: bool,
              only: set | None = None):
    from boilerpipe_coffee_spark.operators import dedup, similarity, textstats

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )

    mb, mr = dedup.minhash_banding(n_docs)
    eb, et = similarity.emb_banding(n_vecs)
    families = [
        ("dedup_minhash_lsh", dedup.dedup_minhash_lsh,
         dedup._minhash_lsh_sql(n_docs)),
        ("dedup_minhash_verified", dedup.dedup_minhash_verified,
         dedup._minhash_verified_sql(n_rows=n_docs)),
        ("dedup_simhash_pairs", dedup.dedup_simhash_pairs,
         dedup.DEDUP_SIMHASH_PAIRS_SQL),
        ("dedup_clusters", dedup.dedup_clusters,
         dedup._clusters_sql(n_docs)),
        ("dedup_embedding_lsh_pairs", similarity.dedup_embedding_lsh_pairs,
         similarity._emb_lsh_pairs_sql(n_rows=n_vecs)),
        ("pack_concat_split", textstats.pack_concat_split,
         textstats.PACK_CONCAT_SPLIT_SQL),
        # r7: cross-doc duplicated-span pass (width is N-independent,
        # so the committed SQL constant is the right oracle at every
        # ladder point)
        ("dup_span_stats", textstats.dup_span_stats,
         textstats.DUP_SPAN_SQL),
        ("minhash_band_stats", dedup.minhash_band_stats,
         dedup._minhash_band_stats_sql(n_docs)),
        ("simhash_chunk_stats", dedup.simhash_chunk_stats,
         dedup.SIMHASH_CHUNK_STATS_SQL),
        ("emb_bucket_stats", similarity.emb_bucket_stats,
         similarity._emb_bucket_stats_sql(n_rows=n_vecs)),
    ]
    # planted-pair ground truth from the generator's _PLANTED.json
    # sidecar -- the pairs ACTUALLY written, recorded at the plant
    # site (ADVICE r6), with exact cosines for the embedding pairs so
    # recall can be stratified by planted-similarity band (VERDICT r6
    # task 4) -- a banding policy could pass parity while losing every
    # true near-dup, and an aggregate recall could hide losing the
    # high-similarity band that real web near-dups live in
    from make_scale_corpus import read_planted

    sidecar = read_planted(d)
    doc_truth = [tuple(p) for p in sidecar["doc_pairs"]]
    vec_truth = [(s, t) for s, t, _ in sidecar["vec_pairs"]]
    vec_cosine = {(s, t): c for s, t, c in sidecar["vec_pairs"]}
    COS_BANDS = [(0.55, 0.7), (0.7, 0.9), (0.9, 1.0000001)]

    out = []
    if only:
        families = [f for f in families if f[0] in only]
    for name, fn, sql in families:
        rec = {
            "point": os.path.basename(d), "n_docs": n_docs,
            "n_vecs": n_vecs, "family": name,
            "minhash_banding": [mb, mr], "emb_banding": [eb, et],
        }
        try:
            # time from the fn() call: iterative ops (dedup_clusters)
            # do their work in EAGER checkpoints during plan
            # construction, so timing only the action would hide it
            t0 = time.time()
            sdf = fn(spark, d)
            if skip_oracle:
                if name == "dup_span_stats":
                    # plain count() lets Catalyst prune the whole dup
                    # computation here (the final LEFT join's right
                    # side is provably unique on its groupBy key, so
                    # the join is eliminated and count() reads only
                    # the base table) -- hash every output column to
                    # force real evaluation, and keep a checksum for
                    # the record
                    from pyspark.sql import functions as F

                    row = (
                        sdf.select(F.xxhash64(*sdf.columns).alias("h"))
                        .agg(
                            F.count(F.lit(1)).alias("n"),
                            F.expr("bit_xor(h)").alias("h"),
                        )
                        .collect()[0]
                    )
                    rec["spark_rows"] = row["n"]
                    rec["xxhash_sum"] = int(row["h"])
                else:
                    rec["spark_rows"] = sdf.count()
                rec["spark_sec"] = round(time.time() - t0, 2)
                rec["oracle_skipped"] = True
            else:
                rec.update(_compare(sdf, con, sql, t0))
            if name in ("dedup_minhash_lsh", "dedup_embedding_lsh_pairs"):
                truth = doc_truth if name.startswith("dedup_minhash") else vec_truth
                pairs_df = fn(spark, d)
                got = {
                    (r[0], r[1])
                    for r in pairs_df.select(pairs_df.columns[:2]).collect()
                }
                hits = sum(p in got for p in truth)
                rec["planted_recall"] = [hits, len(truth)]
                if name == "dedup_embedding_lsh_pairs":
                    # per-band recall: bin planted pairs by their
                    # exact planted cosine; the >=0.9 band is the one
                    # real web near-dups occupy
                    bands = {}
                    for lo, hi in COS_BANDS:
                        in_band = [
                            p for p in truth if lo <= vec_cosine[p] < hi
                        ]
                        bands[f"[{lo},{min(hi, 1.0)})"] = [
                            sum(p in got for p in in_band), len(in_band)
                        ]
                    rec["recall_by_cosine_band"] = bands
            if name in (
                "minhash_band_stats", "simhash_chunk_stats",
                "emb_bucket_stats",
            ):
                rec["stats"] = {
                    k: (v.item() if hasattr(v, "item") else v)
                    for k, v in fn(spark, d).collect()[0].asDict().items()
                }
            rec["err"] = None
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
        print(json.dumps(rec), flush=True)
        out.append(rec)
    con.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/scale")
    ap.add_argument(
        "--ladder", default="500:500,5000:2000,50000:20000",
        help="comma-separated n_docs:n_vecs points",
    )
    ap.add_argument(
        "--skip-oracle-over", type=int, default=10**9,
        help="skip the DuckDB side for points with n_docs above this",
    )
    ap.add_argument(
        "--families", default=None,
        help="comma-separated family subset (default: all)",
    )
    args = ap.parse_args()

    from make_scale_corpus import corpus_current, write_corpus

    points = []
    for part in args.ladder.split(","):
        nd, nv = (int(x) for x in part.split(":"))
        d = os.path.join(args.base, f"d{nd}_v{nv}")
        if not corpus_current(d):
            write_corpus(d, nd, nv)
            print(json.dumps({"generated": d, "docs": nd, "vecs": nv}),
                  flush=True)
        points.append((d, nd, nv))

    spark = _spark()
    all_recs = []
    for d, nd, nv in points:
        all_recs += run_point(
            spark, d, nd, nv, skip_oracle=nd > args.skip_oracle_over,
            only=set(args.families.split(",")) if args.families else None,
        )
    bad = [r for r in all_recs
           if r["err"] or not r.get("hash_match", True)]
    print(json.dumps({
        "summary": {
            "points": len(points), "rows": len(all_recs),
            "bad": [(r["point"], r["family"]) for r in bad],
        }
    }))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
