"""Golden differential suite: the pure-Python core must reproduce the
unmodified reference's output span sequences exactly -- (kind, text,
media_ref, order) per document, per extractor, including which
documents crash the reference (quarantined as error='reference_throw').

Expected outputs were produced by tools/oracle.js running
/root/reference/lib/Boilerpipe.js verbatim (see tools/make_golden.py).
"""

import pytest

from boilerpipe_coffee_spark.spans import extract_spans

from helpers import load_golden

EXTRACTORS = [
    "ArticleExtractor",
    "DefaultExtractor",
    "LargestContentExtractor",
    "KeepEverythingExtractor",
]


@pytest.mark.parametrize("extractor", EXTRACTORS)
def test_golden_t1(extractor):
    _run("t1", extractor)


@pytest.mark.parametrize("extractor", EXTRACTORS)
def test_golden_t2(extractor):
    _run("t2", extractor)


def _run(corpus, extractor):
    docs = load_golden(f"{corpus}_docs")
    expected = {g["doc_id"]: g for g in load_golden(f"{corpus}_{extractor}")}
    assert len(docs) == len(expected)
    mismatches = []
    for doc in docs:
        exp = expected[doc["doc_id"]]
        title, spans, error = extract_spans(doc["spans"], extractor)
        if error is not None:
            got = {"title": "", "spans": [], "error": error}
        else:
            got = {"title": title, "spans": spans, "error": None}
        want = {"title": exp["title"], "spans": exp["spans"], "error": exp["error"]}
        if got != want:
            mismatches.append((doc["doc_id"], want, got))
    assert not mismatches, (
        f"{len(mismatches)} mismatching docs; first: {mismatches[0]}"
    )
