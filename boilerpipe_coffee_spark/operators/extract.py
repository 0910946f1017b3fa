"""Spark extraction operators.

Two pipelines, both golden-exact against the reference:

1. the PRODUCTION path (operators.arrow_extract.extract_arrow,
   exported as ``extract``; :func:`extract_pandas` is the mapInPandas
   reference variant).  One map stage: parse + filter chain + span
   reassembly per document inside Arrow batches.  Documents are independent, so this is embarrassingly
   parallel with ZERO shuffles -- the plan is scan -> python eval ->
   sink, and at 10^12 documents the only costs are IO and CPU.  This is
   deliberately NOT a translation of the reference's per-document loop
   into many Spark stages: a per-doc-sequential filter chain gains
   nothing from inter-stage shuffles and pays the full exchange of the
   exploded block table (bigger than the input) at every stage.

2. :func:`extract_staged` -- the OPERATOR-DECOMPOSED path.  Exposes the
   filter chain as real Spark stages over an exploded blocks DataFrame:
   columnar window/when stages (operators.columnar) for the stateless
   filters and one ``applyInPandas`` for the order-dependent fusion
   tail.  Costs exactly ONE hash exchange on doc_id, which the window
   stages and the applyInPandas group share.  Exists to prove each
   reference operator maps to an idiomatic Spark operator and to serve
   unit-level operator queries; bench.py measures both paths.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.extractors import ARTICLE
from ..sources import OUTPUT_SCHEMA
from ..spans import extract_spans

# ---------------------------------------------------------------- #
# production path: one vectorized stage, no shuffle                 #
# ---------------------------------------------------------------- #


def extract_pandas(df: DataFrame, extractor: str = ARTICLE) -> DataFrame:
    """(doc_id, spans) -> (doc_id, title, spans, error).

    Reference parity: output spans match lib/Boilerpipe.js per document
    (golden suite); documents on which the reference throws (quirk Q9 /
    nested <a>) come back with error='reference_throw' and empty spans
    instead of failing the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].tolist()
            titles, out_spans, errors = [], [], []
            for spans in pdf["spans"]:
                title, spans_out, error = extract_spans(_as_dicts(spans), extractor)
                titles.append(title)
                out_spans.append(spans_out)
                errors.append(error)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "title": titles,
                    "spans": out_spans,
                    "error": errors,
                }
            )

    return df.mapInPandas(run, schema=OUTPUT_SCHEMA)


def _as_dicts(spans):
    # Arrow gives list[dict] for array<struct>; be tolerant of numpy
    if spans is None:
        return []
    return [dict(s) for s in spans]


# ---------------------------------------------------------------- #
# staged path: exploded blocks DF + columnar stages + fusion tail   #
# ---------------------------------------------------------------- #

# one row per text block, plus one row per media span (is_media=true).
# Media rows sort after all block rows inside each doc_id group, so
# window lag/lead sees NULL features at both block-sequence edges --
# exactly the reference's undefined-placeholder semantics (quirk Q2).
BLOCKS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("title", StringType()),
        StructField("is_media", BooleanType(), False),
        StructField("block_offset", IntegerType()),
        StructField("span_offset", IntegerType()),
        StructField("text", StringType()),
        StructField("tag_level", IntegerType()),
        StructField("num_words", IntegerType()),
        StructField("num_words_anchor", IntegerType()),
        StructField("num_words_wrapped", IntegerType()),
        StructField("num_wrapped_lines", IntegerType()),
        StructField("text_density", DoubleType()),
        StructField("link_density", DoubleType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("media_offset", IntegerType()),
        StructField("error", StringType()),
        StructField("is_content", BooleanType()),
        StructField("end_of_text", BooleanType()),
    ]
)


def parse_blocks(df: DataFrame) -> DataFrame:
    """mapInPandas parse/featurize: (doc_id, spans) -> block+media rows.

    Parse errors (reference throw points reached during parsing, e.g.
    nested <a>) emit a single error row so quarantining survives the
    staged pipeline too.
    """
    from bisect import bisect_right

    from ..core.jsquirks import ReferenceThrow
    from ..core.parser import BoilerpipeParser
    from ..spans import html_from_spans

    names = [f.name for f in BLOCKS_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parser = BoilerpipeParser()
        for pdf in batches:
            cols = {name: [] for name in names}

            def emit(doc_id, title, is_media, block_offset, span_offset,
                     text, tag_level, num_words, num_words_anchor,
                     num_words_wrapped, num_wrapped_lines, text_density,
                     link_density, kind, media_ref, media_offset, error,
                     is_content, end_of_text):
                cols["doc_id"].append(doc_id)
                cols["title"].append(title)
                cols["is_media"].append(is_media)
                cols["block_offset"].append(block_offset)
                cols["span_offset"].append(span_offset)
                cols["text"].append(text)
                cols["tag_level"].append(tag_level)
                cols["num_words"].append(num_words)
                cols["num_words_anchor"].append(num_words_anchor)
                cols["num_words_wrapped"].append(num_words_wrapped)
                cols["num_wrapped_lines"].append(num_wrapped_lines)
                cols["text_density"].append(text_density)
                cols["link_density"].append(link_density)
                cols["kind"].append(kind)
                cols["media_ref"].append(media_ref)
                cols["media_offset"].append(media_offset)
                cols["error"].append(error)
                cols["is_content"].append(is_content)
                cols["end_of_text"].append(end_of_text)

            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                spans = _as_dicts(spans)
                html, starts, span_offsets = html_from_spans(spans)
                try:
                    doc = parser.parse_document_from_html(html)
                except ReferenceThrow:
                    emit(doc_id, "", False, None, None, None, None, None,
                         None, None, None, None, None, None, None, None,
                         "reference_throw", None, None)
                    continue
                for tb in doc.text_blocks:
                    if tb.src_pos >= 0 and starts:
                        so = span_offsets[bisect_right(starts, tb.src_pos) - 1]
                    else:
                        so = span_offsets[0] if span_offsets else 0
                    emit(doc_id, doc.title, False, tb.offset_start, so,
                         tb.text, tb.tag_level, tb.num_words,
                         int(tb.num_words_in_anchor_text),
                         int(tb.num_words_in_wrapped_lines),
                         int(tb.num_wrapped_lines), float(tb.text_density),
                         float(tb.link_density), "text", None, None, None,
                         False, False)
                has_media = False
                for s in spans:
                    if s["kind"] != "text":
                        has_media = True
                        emit(doc_id, doc.title, True, None, None, None,
                             None, None, None, None, None, None, None,
                             s["kind"], s["media_ref"], s["offset"], None,
                             None, None)
                if not doc.text_blocks and not has_media:
                    emit(doc_id, doc.title, False, None, None, None, None,
                         None, None, None, None, None, None, "empty", None,
                         None, None, None, None)
            yield pd.DataFrame(cols, columns=names)

    return df.mapInPandas(run, schema=BLOCKS_SCHEMA)




def extract_staged(df: DataFrame, extractor: str = ARTICLE) -> DataFrame:
    """Operator-decomposed pipeline; output equals :func:`extract`."""
    from . import columnar
    from .fusion import fuse_and_assemble

    blocks = parse_blocks(df)

    has_window_stage = False
    if extractor == "ArticleExtractor":
        blocks = columnar.terminating_blocks_finder(blocks)
        # DocumentTitleMatchClassifier(null, false) is a no-op (Q3)
        blocks = columnar.num_words_rules_classifier(blocks)
        blocks = columnar.ignore_blocks_after_content(blocks, 60)
        has_window_stage = True
    elif extractor == "LargestContentExtractor":
        blocks = columnar.num_words_rules_classifier(blocks)
        has_window_stage = True
    elif extractor == "KeepEverythingExtractor":
        blocks = columnar.mark_everything_content(blocks)
    elif extractor in ("DefaultExtractor", "Unfiltered"):
        pass  # SimpleBlockFusion runs first -> handled in the fusion tail

    # window stages leave blocks hash-partitioned by doc_id and sorted;
    # chains without one need the layout established explicitly
    return fuse_and_assemble(blocks, extractor, ensure_layout=not has_window_stage)
