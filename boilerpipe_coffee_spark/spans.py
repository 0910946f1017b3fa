"""Interleaved-span document handling.

Input rows follow BASELINE.json ``input_hint``::

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string,
                         offset:int>>

The document's HTML is the concatenation of ``kind='text'`` span texts
in ``offset`` order; media spans contribute nothing to the HTML but are
preserved in the output, interleaved by offset.  Output spans are
``(kind, text, media_ref, order)`` where text spans carry the final
content-block text (one output span per surviving content block) and
``order`` is the position in the final per-document sequence.

Attribution contract (FIXTURES.md section 3): every generated text span
is a self-contained run of block-level elements, so each TextBlock is
created strictly within one span; a merged block is attributed to the
span containing its earliest original block.  We recover that span from
the block's first-text character position (``TextBlock.src_pos``)
against the cumulative span text lengths; the node oracle recovers it
via per-span block counts -- both agree under the contract and the
golden differential suite proves it.
"""

from __future__ import annotations

from bisect import bisect_right

from .core.extractors import ARTICLE, document_from_html
from .core.jsquirks import ReferenceThrow

REFERENCE_THROW = "reference_throw"


def html_from_spans(spans):
    """Concatenate text spans in offset order.

    Returns (html, starts, span_offsets): ``starts[i]`` is the char
    offset where text-span i begins in the concatenation and
    ``span_offsets[i]`` its original ``offset`` value.
    """
    text_spans = sorted(
        (s for s in spans if s["kind"] == "text"), key=lambda s: s["offset"]
    )
    parts = []
    starts = []
    span_offsets = []
    at = 0
    for s in text_spans:
        t = s["text"] or ""
        starts.append(at)
        span_offsets.append(s["offset"])
        parts.append(t)
        at += len(t)
    return "".join(parts), starts, span_offsets


def extract_spans(spans, extractor: str = ARTICLE):
    """Extract one interleaved document.

    Returns ``(title, out_spans, error)`` where ``out_spans`` is a list
    of dicts ``{kind, text, media_ref, order}``.  ``error`` is None or
    ``'reference_throw'`` for documents on which the reference
    implementation crashes (quirk Q9 / nested-anchor recovery).
    """
    html, starts, span_offsets = html_from_spans(spans)
    media = sorted(
        (s for s in spans if s["kind"] != "text"), key=lambda s: s["offset"]
    )
    try:
        doc = document_from_html(html, extractor)
    except ReferenceThrow:
        return "", [], REFERENCE_THROW

    # key: (owning span offset, block original start index); media spans
    # sort on their own offset -- offsets are unique per document so the
    # two kinds never collide.
    keyed = []
    for tb in doc.text_blocks:
        if not tb.is_content:
            continue
        if tb.src_pos >= 0 and starts:
            idx = bisect_right(starts, tb.src_pos) - 1
            span_off = span_offsets[idx]
        else:
            span_off = span_offsets[0] if span_offsets else 0
        keyed.append(((span_off, tb.offset_start), "text", tb.text, None))
    for m in media:
        keyed.append(((m["offset"], -1), m["kind"], None, m["media_ref"]))
    keyed.sort(key=lambda item: item[0])

    out = [
        {"kind": kind, "text": text, "media_ref": ref, "order": order}
        for order, (_, kind, text, ref) in enumerate(keyed)
    ]
    return doc.title, out, None
