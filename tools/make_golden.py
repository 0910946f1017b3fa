#!/usr/bin/env python
"""Generate the committed golden corpora + expected outputs.

t1 (200 docs, smoke) and t2 (2000 docs, correctness) per FIXTURES.md;
expected outputs come from the unmodified reference via tools/oracle.js
for each extractor.  Run from the repo root:

    python tools/make_golden.py
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boilerpipe_coffee_spark.fixtures import generate_corpus  # noqa: E402

EXTRACTORS = [
    "ArticleExtractor",
    "DefaultExtractor",
    "LargestContentExtractor",
    "KeepEverythingExtractor",
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(ROOT, "tests", "golden")


FLAGSHIP_EXTRACTORS = EXTRACTORS + ["Unfiltered"]
FLAGSHIP_DOCS = 300  # == __spark_entry__.N_FLAGSHIP_DOCS
FLAGSHIP_SEED = 42
FLAGSHIP_GIANT_MAX = 600  # == sources.synth_interleaved default


def make_flagship_parity_parquet() -> None:
    """Committed expected-spans parquet for the driver-visible
    ``extract_parity`` query: the flagship corpus (synth_interleaved's
    deterministic generate_doc stream) through the UNMODIFIED reference
    for every extractor, exploded to the flagship output row shape
    (posexplode_outer semantics: error/empty docs emit one all-null
    span row)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = generate_corpus(
        FLAGSHIP_DOCS, seed=FLAGSHIP_SEED, giant_max=FLAGSHIP_GIANT_MAX
    )
    payload = "\n".join(json.dumps(d) for d in docs).encode()
    cols = {
        k: []
        for k in (
            "extractor", "doc_id", "title", "error",
            "kind", "text", "media_ref", "out_order",
        )
    }
    for extractor in FLAGSHIP_EXTRACTORS:
        out = subprocess.run(
            ["node", os.path.join(ROOT, "tools", "oracle.js"), extractor],
            input=payload,
            capture_output=True,
            check=True,
        )
        n_err = 0
        for line in out.stdout.decode().splitlines():
            g = json.loads(line)
            n_err += bool(g["error"])
            spans = g["spans"] or [None]  # posexplode_outer on []
            for s in spans:
                cols["extractor"].append(extractor)
                cols["doc_id"].append(g["doc_id"])
                cols["title"].append(g["title"])
                cols["error"].append(g["error"])
                cols["kind"].append(s["kind"] if s else None)
                cols["text"].append(s["text"] if s else None)
                cols["media_ref"].append(s["media_ref"] if s else None)
                cols["out_order"].append(s["order"] if s else None)
        print(
            f"flagship {extractor}: {FLAGSHIP_DOCS} docs, "
            f"{n_err} reference throws"
        )
    table = pa.table(
        {
            "extractor": pa.array(cols["extractor"], pa.string()),
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "error": pa.array(cols["error"], pa.string()),
            "kind": pa.array(cols["kind"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "media_ref": pa.array(cols["media_ref"], pa.string()),
            "out_order": pa.array(cols["out_order"], pa.int32()),
        }
    )
    pq.write_table(
        table,
        os.path.join(GOLDEN_DIR, "flagship_spans.parquet"),
        compression="zstd",
    )


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_flagship_parity_parquet()
    for name, n_docs, seed in [("t1", 200, 42), ("t2", 2000, 42)]:
        docs = generate_corpus(n_docs, seed=seed)
        docs_path = os.path.join(GOLDEN_DIR, f"{name}_docs.jsonl.gz")
        with gzip.open(docs_path, "wt") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        payload = gzip.open(docs_path, "rb").read()
        for extractor in EXTRACTORS:
            out = subprocess.run(
                ["node", os.path.join(ROOT, "tools", "oracle.js"), extractor],
                input=payload,
                capture_output=True,
                check=True,
            )
            out_path = os.path.join(GOLDEN_DIR, f"{name}_{extractor}.jsonl.gz")
            with gzip.open(out_path, "wb", compresslevel=9) as f:
                f.write(out.stdout)
            n_err = sum(
                1
                for line in out.stdout.decode().splitlines()
                if json.loads(line)["error"]
            )
            print(f"{name} {extractor}: {n_docs} docs, {n_err} reference throws")


if __name__ == "__main__":
    main()
