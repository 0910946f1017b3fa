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


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
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
