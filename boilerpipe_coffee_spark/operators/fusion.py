"""Order-dependent fusion tail for the staged pipeline.

BlockProximityFusion / RemoveNonContentBlocksFilter /
KeepLargestBlockFilter (and SimpleBlockFusion + DensityRules for the
DefaultExtractor) mutate a live per-document block array with
snapshot-iteration and skip-on-remove quirks (Q5-Q9) -- inherently
sequential per document.  They run here as ONE ``applyInPandas`` over
``groupBy(doc_id)``; the grouping reuses the hash partitioning the
columnar window stages already established, so the staged pipeline
costs a single exchange end to end.

Inside the group we rebuild core TextBlocks and run the verified core
filters -- the same code the production path uses -- so quirk parity is
structural, not re-derived.
"""

from __future__ import annotations

import math

import pandas as pd
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


def _rebuild_block(row) -> TextBlock:
    tb = TextBlock(
        row.text,
        None,
        int(row.tag_level),
        int(row.num_words),
        int(row.num_words_anchor),
        int(row.num_words_wrapped),
        int(row.num_wrapped_lines),
        int(row.block_offset),
        src_pos=int(row.span_offset),  # src_pos doubles as span owner
    )
    tb.is_content = bool(row.is_content) if row.is_content is not None else False
    if row.end_of_text:
        tb.add_label(END_OF_TEXT)
    return tb


def _assemble(doc_id, title, doc, media_rows):
    keyed = []
    for tb in doc.text_blocks:
        if not tb.is_content:
            continue
        keyed.append(((tb.src_pos, tb.offset_start), "text", tb.text, None))
    for kind, ref, offset in media_rows:
        keyed.append(((offset, -1), kind, None, ref))
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


def fuse_and_assemble(blocks: DataFrame, extractor: str) -> DataFrame:
    tail_factory = _TAILS.get(extractor, _TAILS["DefaultExtractor"])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            if g["error"].notna().any():
                err = g.loc[g["error"].notna(), "error"].iloc[0]
                out.append(
                    {"doc_id": doc_id, "title": "", "spans": [], "error": err}
                )
                continue
            media_mask = g["is_media"].fillna(False)
            brows = g[~media_mask & (g["kind"] != "empty")].sort_values(
                "block_offset"
            )
            title = ""
            if len(g):
                t = g["title"].dropna()
                if len(t):
                    title = t.iloc[0]
            blocks_list = [_rebuild_block(r) for r in brows.itertuples()]
            doc = TextDocument(title, blocks_list)
            try:
                for f in tail_factory():
                    f.process(doc)
            except ReferenceThrow:
                out.append(
                    {
                        "doc_id": doc_id,
                        "title": "",
                        "spans": [],
                        "error": REFERENCE_THROW,
                    }
                )
                continue
            media_rows = [
                (r.kind, r.media_ref, int(r.media_offset))
                for r in g[media_mask].itertuples()
            ]
            out.append(_assemble(doc_id, title, doc, media_rows))
        if not out:
            return pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])
        return pd.DataFrame(out)

    return blocks.groupBy("doc_id").applyInPandas(run, schema=OUTPUT_SCHEMA)
