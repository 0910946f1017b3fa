"""Order-dependent fusion tail for the staged pipeline.

BlockProximityFusion / RemoveNonContentBlocksFilter /
KeepLargestBlockFilter (and SimpleBlockFusion + DensityRules for the
DefaultExtractor) mutate a live per-document block array with
snapshot-iteration and skip-on-remove quirks (Q5-Q9) -- inherently
sequential per document.

Execution strategy: after the columnar window stages the blocks are
hash-partitioned by doc_id and sorted (doc_id, is_media, block_offset),
so documents are CONTIGUOUS runs within each partition.  Instead of
``groupBy().applyInPandas`` -- which pays a per-group python call
(~1 ms) that dwarfs the per-document work at millions of tiny groups --
we stream whole partitions through ``mapInPandas`` and split doc runs
ourselves, carrying the tail rows of each Arrow batch into the next so
a document straddling batch boundaries is never split.  Same single
exchange, ~20x less per-doc overhead.

Inside a run we rebuild core TextBlocks and apply the verified core
filters -- the same code the production path uses -- so quirk parity is
structural, not re-derived.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.document import END_OF_TEXT, TextBlock, TextDocument
from ..core.filters import (
    BlockProximityFusion,
    DensityRulesClassifier,
    ExpandTitleToContentFilter,
    KeepLargestBlockFilter,
    RemoveNonContentBlocksFilter,
    SimpleBlockFusionProcessor,
)
from ..core.jsquirks import ReferenceThrow
from ..sources import OUTPUT_SCHEMA
from ..spans import REFERENCE_THROW

_TAILS = {
    "ArticleExtractor": lambda: [
        BlockProximityFusion(1, False, False),
        RemoveNonContentBlocksFilter(),
        BlockProximityFusion(1, True, False),
        KeepLargestBlockFilter(),
        ExpandTitleToContentFilter(),  # dead given Q3; kept for parity
    ],
    "LargestContentExtractor": lambda: [
        BlockProximityFusion(1, False, False),
        KeepLargestBlockFilter(),
    ],
    "DefaultExtractor": lambda: [
        SimpleBlockFusionProcessor(),
        BlockProximityFusion(1, False, False),
        DensityRulesClassifier(),
    ],
    "KeepEverythingExtractor": lambda: [],
    "Unfiltered": lambda: [],
}

_COLS = [
    "doc_id",
    "title",
    "is_media",
    "block_offset",
    "span_offset",
    "text",
    "tag_level",
    "num_words",
    "num_words_anchor",
    "num_words_wrapped",
    "num_wrapped_lines",
    "kind",
    "media_ref",
    "media_offset",
    "error",
    "is_content",
    "end_of_text",
]


def _process_doc(doc_id, rows, tail_factory):
    """rows: list of tuples in _COLS order, sorted blocks-then-media."""
    title = ""
    blocks = []
    media = []
    for r in rows:
        if r[14] is not None:  # error
            return {"doc_id": doc_id, "title": "", "spans": [], "error": r[14]}
        if not title and r[1]:
            title = r[1]
        if r[2]:  # is_media
            media.append((r[11], r[12], int(r[13])))
            continue
        if r[11] == "empty":  # zero-block placeholder row
            continue
        tb = TextBlock(
            r[5],
            None,
            int(r[6]),
            int(r[7]),
            int(r[8]),
            int(r[9]),
            int(r[10]),
            int(r[3]),
            src_pos=int(r[4]),  # src_pos doubles as owning span offset
        )
        tb.is_content = bool(r[15]) if r[15] is not None else False
        if r[16]:
            tb.add_label(END_OF_TEXT)
        blocks.append(tb)

    doc = TextDocument(title, blocks)
    try:
        for f in tail_factory():
            f.process(doc)
    except ReferenceThrow:
        return {"doc_id": doc_id, "title": "", "spans": [], "error": REFERENCE_THROW}

    keyed = [
        ((tb.src_pos, tb.offset_start), "text", tb.text, None)
        for tb in doc.text_blocks
        if tb.is_content
    ]
    keyed.extend(((off, -1), kind, None, ref) for kind, ref, off in media)
    keyed.sort(key=lambda item: item[0])
    return {
        "doc_id": doc_id,
        "title": title,
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "order": i}
            for i, (_, k, t, r) in enumerate(keyed)
        ],
        "error": None,
    }


def fuse_and_assemble(blocks: DataFrame, extractor: str,
                      ensure_layout: bool = False) -> DataFrame:
    """blocks must arrive hash-partitioned by doc_id and sorted
    (doc_id, is_media, block_offset) -- the window stages guarantee it;
    pass ensure_layout=True when no window stage ran."""
    tail_factory = _TAILS.get(extractor, _TAILS["DefaultExtractor"])

    if ensure_layout:
        blocks = blocks.repartition("doc_id").sortWithinPartitions(
            "doc_id", "is_media", "block_offset"
        )

    proj = blocks.select(*_COLS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_id = None
        carry_rows: list = []

        def flush(doc_rows_by_id):
            recs = [
                _process_doc(d, rows, tail_factory)
                for d, rows in doc_rows_by_id
            ]
            return pd.DataFrame(recs) if recs else None

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            rows = list(pdf.itertuples(index=False, name=None))
            runs: list = []
            start = 0
            for i in range(1, len(rows)):
                if ids[i] != ids[i - 1]:
                    runs.append((ids[start], rows[start:i]))
                    start = i
            runs.append((ids[start], rows[start:]))
            done: list = []
            for rid, rrows in runs:
                if carry_id is not None and rid == carry_id:
                    carry_rows.extend(rrows)
                    continue
                if carry_id is not None:
                    done.append((carry_id, carry_rows))
                carry_id, carry_rows = rid, list(rrows)
            # carry always holds the last run seen; it may continue in
            # the next batch
            out = flush(done)
            if out is not None:
                yield out
        if carry_id is not None:
            out = flush([(carry_id, carry_rows)])
            if out is not None:
                yield out

    return proj.mapInPandas(run, schema=OUTPUT_SCHEMA)
