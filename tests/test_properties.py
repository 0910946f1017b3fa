"""Property-based invariants (hypothesis) for the span-document
contract -- no Spark session needed, complements the node-differential
fuzz with pure-structural guarantees over adversarial inputs:

- totality: extract_spans never raises (crash parity is expressed as
  error='reference_throw', everything else must be handled);
- determinism: same input -> same output, twice;
- order contract: output span orders are exactly 0..n-1;
- media preservation: every non-text input span survives (same
  multiset of (kind, media_ref)) whenever the document isn't
  quarantined, and no media appears on quarantined docs.
"""

import string

from hypothesis import given, settings, strategies as st

from boilerpipe_coffee_spark.spans import extract_spans

_TEXTS = st.text(
    alphabet=string.ascii_letters + string.digits + " <>/=\"'&;#\n\t.!?-",
    max_size=120,
)

_HTMLISH = st.one_of(
    _TEXTS,
    st.sampled_from(
        [
            "<body><p>plain words here</p></body>",
            "<body><a href=x>anchor text</a> tail</body>",
            "<body><a><a>nested anchors crash the reference</a></a></body>",
            "<p>no body at all",
            "<title>the title</title>",
            "<script>var x = '<p>';</script>visible",
            "<body><table><tr><td>cell one</td></tr></table></body>",
            "  ﻿",  # exotic JS whitespace
            "",
        ]
    ),
)


@st.composite
def span_docs(draw):
    n_text = draw(st.integers(min_value=0, max_value=6))
    n_media = draw(st.integers(min_value=0, max_value=4))
    offsets = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n_text + n_media,
            max_size=n_text + n_media,
            unique=True,
        )
    )
    spans = []
    for i in range(n_text):
        spans.append(
            {
                "kind": "text",
                "text": draw(_HTMLISH),
                "media_ref": None,
                "offset": offsets[i],
            }
        )
    for j in range(n_media):
        spans.append(
            {
                "kind": draw(st.sampled_from(["image", "audio", "video"])),
                "text": None,
                "media_ref": f"m{j}",
                "offset": offsets[n_text + j],
            }
        )
    # input order is arbitrary relative to offsets
    return draw(st.permutations(spans))


@settings(max_examples=300, deadline=None)
@given(span_docs(), st.sampled_from(["ArticleExtractor", "DefaultExtractor"]))
def test_extract_spans_total_deterministic_ordered(spans, extractor):
    title1, out1, err1 = extract_spans(list(spans), extractor)
    title2, out2, err2 = extract_spans(list(spans), extractor)
    assert (title1, out1, err1) == (title2, out2, err2)  # deterministic

    assert [s["order"] for s in out1] == list(range(len(out1)))

    media_in = sorted(
        (s["kind"], s["media_ref"]) for s in spans if s["kind"] != "text"
    )
    media_out = sorted(
        (s["kind"], s["media_ref"]) for s in out1 if s["kind"] != "text"
    )
    if err1 is None:
        assert media_out == media_in
        # media keep their relative offset order
        by_off = [
            s["media_ref"]
            for s in sorted(
                (s for s in spans if s["kind"] != "text"),
                key=lambda s: s["offset"],
            )
        ]
        assert [s["media_ref"] for s in out1 if s["kind"] != "text"] == by_off
    else:
        assert err1 == "reference_throw" and out1 == [] and title1 == ""
