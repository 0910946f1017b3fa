"""Arrow-native production extraction.

``mapInArrow`` variant of the extract operator: reads the ``spans``
list<struct> column as four flat arrays (one ``to_pylist`` each, all
C-level) and writes the output span column the same way -- no pandas
conversion and no per-span dict objects on either side of the bridge.
Cuts the per-document bridge overhead to a fraction of the parse cost,
which is what keeps python workers CPU-bound (and the N->4N scaling
flat) instead of serialization-bound.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..core.extractors import ARTICLE, document_from_html
from ..core.jsquirks import ReferenceThrow
from ..sources import OUTPUT_SCHEMA
from ..spans import REFERENCE_THROW

_OUT_SPAN = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("order", pa.int32()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("title", pa.string()),
        pa.field("spans", pa.list_(_OUT_SPAN)),
        pa.field("error", pa.string()),
    ]
)


def _extract_one(kinds, texts, refs, offs, lo, hi, extractor):
    """Extract one document from flat span arrays [lo, hi).

    Returns (title, out_kinds, out_texts, out_refs, error); out_* are
    parallel lists, orders implicit by position.
    """
    text_spans = []  # (offset, text)
    media = []  # (offset, kind, ref)
    for i in range(lo, hi):
        if kinds[i] == "text":
            text_spans.append((offs[i], texts[i] or ""))
        else:
            media.append((offs[i], kinds[i], refs[i]))
    text_spans.sort(key=lambda t: t[0])
    media.sort(key=lambda t: t[0])

    parts = []
    starts = []  # char start per text span
    span_offsets = []
    at = 0
    for off, t in text_spans:
        starts.append(at)
        span_offsets.append(off)
        parts.append(t)
        at += len(t)
    html = "".join(parts)

    try:
        doc = document_from_html(html, extractor)
    except ReferenceThrow:
        return "", [], [], [], REFERENCE_THROW

    from bisect import bisect_right

    keyed = []
    for tb in doc.text_blocks:
        if not tb.is_content:
            continue
        if tb.src_pos >= 0 and starts:
            so = span_offsets[bisect_right(starts, tb.src_pos) - 1]
        else:
            so = span_offsets[0] if span_offsets else 0
        keyed.append(((so, tb.offset_start), "text", tb.text, None))
    for off, kind, ref in media:
        keyed.append(((off, -1), kind, None, ref))
    keyed.sort(key=lambda item: item[0])
    ok = [k for _, k, _, _ in keyed]
    ot = [t for _, _, t, _ in keyed]
    orf = [r for _, _, _, r in keyed]
    return doc.title, ok, ot, orf, None


def extract_arrow(df: DataFrame, extractor: str = ARTICLE) -> DataFrame:
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_col = batch.column("spans")
            # pair the list offsets with the UNFLATTENED child array:
            # value_lengths() maps null slots to 0 but flatten() drops
            # their backing ranges, which would desynchronize every
            # later document if a null slot ever carried values
            in_offsets = spans_col.offsets.to_pylist()
            valid = spans_col.is_valid().to_pylist()
            values = spans_col.values
            kinds = values.field("kind").to_pylist()
            texts = values.field("text").to_pylist()
            refs = values.field("media_ref").to_pylist()
            offs = values.field("offset").to_pylist()

            titles, errors = [], []
            flat_k, flat_t, flat_r, flat_o = [], [], [], []
            list_offsets = [0]
            for i in range(len(doc_ids)):
                lo, hi = (
                    (in_offsets[i], in_offsets[i + 1]) if valid[i] else (0, 0)
                )
                title, ok, ot, orf, err = _extract_one(
                    kinds, texts, refs, offs, lo, hi, extractor
                )
                titles.append(title)
                errors.append(err)
                flat_k.extend(ok)
                flat_t.extend(ot)
                flat_r.extend(orf)
                flat_o.extend(range(len(ok)))
                list_offsets.append(len(flat_k))

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
                pa.array(list_offsets, pa.int32()), struct_arr
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, pa.string()),
                    pa.array(titles, pa.string()),
                    spans_out,
                    pa.array(errors, pa.string()),
                ],
                schema=_OUT_SCHEMA,
            )

    return df.mapInArrow(run, schema=OUTPUT_SCHEMA)
