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

import pyarrow as pa
from pyspark.sql import DataFrame

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
    """rows: list of tuples in _COLS order, sorted blocks-then-media.

    Returns (title, [(kind, text, media_ref), ...], error) -- span
    orders are implicit by position."""
    title = ""
    blocks = []
    media = []
    for r in rows:
        if r[14] is not None:  # error
            return "", [], r[14]
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
        return "", [], REFERENCE_THROW

    keyed = [
        ((tb.src_pos, tb.offset_start), "text", tb.text, None)
        for tb in doc.text_blocks
        if tb.is_content
    ]
    keyed.extend(((off, -1), kind, None, ref) for kind, ref, off in media)
    keyed.sort(key=lambda item: item[0])
    return title, [(k, t, r) for _, k, t, r in keyed], None


_OUT_SPAN = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("order", pa.int32()),
    ]
)
_PA_OUT = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("title", pa.string()),
        pa.field("spans", pa.list_(_OUT_SPAN)),
        pa.field("error", pa.string()),
    ]
)


def fuse_and_assemble(blocks: DataFrame, extractor: str,
                      ensure_layout: bool = False) -> DataFrame:
    """blocks must arrive hash-partitioned by doc_id and sorted
    (doc_id, is_media, block_offset) -- the window stages guarantee it;
    pass ensure_layout=True when no window stage ran.

    mapInArrow: rows cross the bridge as flat column lists and the
    output span column is assembled as Arrow list/struct arrays
    directly -- no pandas frames and no per-span dict objects."""
    tail_factory = _TAILS.get(extractor, _TAILS["DefaultExtractor"])

    if ensure_layout:
        blocks = blocks.repartition("doc_id").sortWithinPartitions(
            "doc_id", "is_media", "block_offset"
        )

    proj = blocks.select(*_COLS)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        carry_id = None
        carry_rows: list = []

        def flush(doc_rows_by_id):
            if not doc_rows_by_id:
                return None
            doc_ids, titles, errors = [], [], []
            flat_k, flat_t, flat_r, flat_o = [], [], [], []
            offsets = [0]
            for d, rows in doc_rows_by_id:
                title, spans, err = _process_doc(d, rows, tail_factory)
                doc_ids.append(d)
                titles.append(title)
                errors.append(err)
                for k, t, r in spans:
                    flat_k.append(k)
                    flat_t.append(t)
                    flat_r.append(r)
                flat_o.extend(range(len(spans)))
                offsets.append(len(flat_k))
            struct_arr = pa.StructArray.from_arrays(
                [
                    pa.array(flat_k, pa.string()),
                    pa.array(flat_t, pa.string()),
                    pa.array(flat_r, pa.string()),
                    pa.array(flat_o, pa.int32()),
                ],
                fields=list(_OUT_SPAN),
            )
            spans_out = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), struct_arr
            )
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, pa.string()),
                    pa.array(titles, pa.string()),
                    spans_out,
                    pa.array(errors, pa.string()),
                ],
                schema=_PA_OUT,
            )

        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = [batch.column(name).to_pylist() for name in _COLS]
            ids = cols[0]
            rows = list(zip(*cols))
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

    return proj.mapInArrow(run, schema=OUTPUT_SCHEMA)
