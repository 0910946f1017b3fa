"""run_pipeline --scrub-pii (round 7, VERDICT r6 task 5): a planted
corpus carries one positive per PII class through the FULL job --
extraction, gates, dedup, scrub, chunking -- and the materialized
training/chunks tables must contain the placeholder tokens and none
of the raw PII.

Markers are chosen so each planted value matches EXACTLY its own
class regex (the 9-digit id avoids the >=10-digit phone overlap, the
phone's digit runs stay under the 9-digit id floor) and carries a
tokenization-surviving lowercase-alnum marker for the chunk-level
absence assertion (chunk_text is re-joined TOKENS, so '<EMAIL>'
becomes the token 'email' there -- the raw-marker absence is the
meaningful check).
"""

import json
import os
import subprocess
import sys

import duckdb

from boilerpipe_coffee_spark.fixtures import generate_doc
from boilerpipe_coffee_spark.sources import INTERLEAVED_SCHEMA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "run_pipeline.py")

PII_SENTENCE = (
    "contact qqleakmailqq@evil.example.com or "
    "http://qqleakurlqq.example/a from 251.252.253.254 "
    "ssn 987-65-4321 phone (555) 123-4567 id 998877665 ."
)
RAW_MARKERS = ["qqleakmailqq", "qqleakurlqq", "998877665"]


def test_pipeline_scrub_pii_e2e(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scrub")
    in_dir = str(base / "input")
    out = str(base / "out")

    rows = []
    for i in range(60):
        d = generate_doc(i, seed=42)
        spans = [dict(s) for s in d["spans"]]
        # inject the PII sentence into the first (content) paragraph
        # so extraction keeps it alongside the surrounding content
        for s in spans:
            if s["kind"] == "text" and "<p>" in (s["text"] or ""):
                s["text"] = s["text"].replace(
                    "<p>", "<p>" + PII_SENTENCE + " ", 1
                )
                break
        rows.append((d["doc_id"], [
            (s["kind"], s.get("text"), s.get("media_ref"), s["offset"])
            for s in spans
        ]))
    spark.createDataFrame(rows, INTERLEAVED_SCHEMA).write.parquet(in_dir)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable, JOB, "--input", in_dir, "--output", out,
            # --no-near-dup: the lorem synth corpus near-dup-collapses
            # to ONE keeper (shared sentence pool), which starves the
            # planted assertions; the scrub stage is orthogonal to
            # stage 4 and runs on whatever keep-set reaches it
            "--buckets", "4", "--scrub-pii", "--emit-chunks",
            "--no-near-dup",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env,
    )
    lines = [
        l for l in proc.stdout.strip().splitlines() if l.startswith("{")
    ]
    assert lines, (
        f"no summary JSON; rc={proc.returncode} "
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    s = json.loads(lines[-1])

    # every kept doc whose injected paragraph survived extraction
    # carries exactly one match per class -- the six totals must agree
    totals = s["pii_scrubbed"]
    assert set(totals) == {"urls", "emails", "ips", "ssns", "phones", "ids"}
    assert totals["urls"] >= 1
    assert len(set(totals.values())) == 1, totals
    assert totals["urls"] <= s["kept"]

    con = duckdb.connect()
    training = f"read_parquet('{out}/training/*.parquet')"
    chunks = f"read_parquet('{out}/chunks/*.parquet')"
    # raw PII never reaches the materialized tables
    for marker in RAW_MARKERS:
        n_t = con.sql(
            f"SELECT count(*) FROM {training} WHERE text LIKE '%{marker}%'"
        ).fetchone()[0]
        n_c = con.sql(
            f"SELECT count(*) FROM {chunks} "
            f"WHERE chunk_text LIKE '%{marker}%'"
        ).fetchone()[0]
        assert n_t == 0 and n_c == 0, (marker, n_t, n_c)
    # placeholders do: one doc per planted email carries <EMAIL>
    n_redacted = con.sql(
        f"SELECT count(*) FROM {training} WHERE text LIKE '%<EMAIL>%'"
    ).fetchone()[0]
    assert n_redacted == totals["emails"]
    # per-doc counts are in the training schema
    cols = {
        r[0]
        for r in con.sql(f"DESCRIBE SELECT * FROM {training}").fetchall()
    }
    assert {"n_urls", "n_emails", "n_ids"} <= cols
    # n_tokens describes the text the table CARRIES (recomputed after
    # scrubbing -- placeholders tokenize differently than raw PII)
    n_stale = con.sql(
        f"SELECT count(*) FROM {training} WHERE n_tokens != "
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        " x -> x != ''))"
    ).fetchone()[0]
    assert n_stale == 0
    con.close()
