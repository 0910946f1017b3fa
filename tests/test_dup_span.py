"""Planted-corpus behavior of dup_span_stats (cross-doc duplicated
spans): the gaps-and-islands span count and the distinct-docs rule
have exact expected values by construction, which the DuckDB-oracle
comparison on the driver corpora cannot pin down."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from boilerpipe_coffee_spark.operators.textstats import (
    DUP_SPAN_SCRUB_SQL,
    DUP_SPAN_SQL,
    DUP_SPAN_W,
    dup_span_scrub,
    dup_span_stats,
)


def _write_documents(tmp_path, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["plant"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


SPAN_LEN = 15  # > DUP_SPAN_W so each span yields SPAN_LEN - W + 1 windows


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dupspan")
    span1 = " ".join(f"s1w{i}" for i in range(SPAN_LEN))
    span2 = " ".join(f"s2w{i}" for i in range(SPAN_LEN))

    def filler(tag, n=10):
        return " ".join(f"{tag}f{i}" for i in range(n))

    # A and B share two disjoint 15-word spans in different contexts;
    # C is entirely unique; D repeats span1 WITHIN itself only (must
    # NOT count: the rule is >=2 distinct docs).  D's repeat makes
    # span1's windows duplicated for A and B too? No -- span1 is
    # already shared by A and B; D just joins that group.  So use a
    # third span for D's self-repeat, shared with no other doc.
    span3 = " ".join(f"s3w{i}" for i in range(SPAN_LEN))
    rows = [
        (1, " ".join([filler("a1"), span1, filler("a2"), span2, filler("a3")])),
        (2, " ".join([filler("b1"), span1, filler("b2"), span2, filler("b3")])),
        (3, " ".join(f"c{i}" for i in range(40))),
        (4, " ".join([filler("d1"), span3, filler("d2"), span3, filler("d3")])),
    ]
    return _write_documents(tmp, rows)


def test_planted_span_counts(spark, planted_dir):
    got = {r.doc_id: r for r in dup_span_stats(spark, planted_dir).collect()}
    per_span = SPAN_LEN - DUP_SPAN_W + 1  # windows fully inside a span
    for d in (1, 2):
        assert got[d].dup_windows == 2 * per_span, got[d]
        assert got[d].dup_spans == 2, got[d]
    # unique doc: zero everywhere
    assert got[3].dup_windows == 0 and got[3].dup_spans == 0
    # within-doc repetition alone is NOT cross-doc duplication
    assert got[4].dup_windows == 0 and got[4].dup_spans == 0
    # n_windows sanity: 3*10 filler + 2*15 span = 60 tokens -> 49
    assert got[1].n_windows == 60 - DUP_SPAN_W + 1


def test_planted_oracle_parity(spark, planted_dir):
    got = sorted(
        tuple(r) for r in dup_span_stats(spark, planted_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(x.item() if hasattr(x, "item") else x for x in row)
        for row in con.sql(DUP_SPAN_SQL).df().itertuples(index=False, name=None)
    )
    con.close()
    assert got == want


def test_planted_scrub_removes_exactly_the_shared_spans(spark, planted_dir):
    """Only windows FULLY inside a shared span are duplicated (the
    straddling windows mix doc-unique filler), and their coverage
    union is exactly the span's SPAN_LEN tokens -- so the scrub must
    remove precisely the shared spans and keep every filler token."""
    got = {r.doc_id: r for r in dup_span_scrub(spark, planted_dir).collect()}

    def filler(tag, n=10):
        return " ".join(f"{tag}f{i}" for i in range(n))

    for d, tag in ((1, "a"), (2, "b")):
        assert got[d].n_tokens == 60
        assert got[d].removed_tokens == 2 * SPAN_LEN, got[d]
        want = " ".join(filler(f"{tag}{i}") for i in (1, 2, 3))
        assert got[d].scrubbed_text == want
    # unique doc: untouched, already in tokenizer normal form
    assert got[3].removed_tokens == 0
    assert got[3].scrubbed_text == " ".join(f"c{i}" for i in range(40))
    # within-doc repetition alone is NOT cross-doc duplication
    assert got[4].removed_tokens == 0


def test_planted_scrub_oracle_parity(spark, planted_dir):
    got = sorted(
        tuple(r) for r in dup_span_scrub(spark, planted_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(x.item() if hasattr(x, "item") else x for x in row)
        for row in con.sql(DUP_SPAN_SCRUB_SQL)
        .df()
        .itertuples(index=False, name=None)
    )
    con.close()
    assert got == want


def test_scrub_full_doc_removal(spark, tmp_path):
    """Two byte-identical docs: every window is duplicated, coverage
    is the whole doc -> scrubbed_text is '' on both engines (the
    all-removed edge the LEFT-JOIN coalesce branch handles)."""
    text = " ".join(f"w{i}" for i in range(DUP_SPAN_W + 5))
    d = _write_documents(tmp_path, [(1, text), (2, text)])
    got = {r.doc_id: r for r in dup_span_scrub(spark, d).collect()}
    for i in (1, 2):
        assert got[i].removed_tokens == got[i].n_tokens == DUP_SPAN_W + 5
        assert got[i].scrubbed_text == ""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = con.sql(DUP_SPAN_SCRUB_SQL).fetchall()
    con.close()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_scrub_overlapping_spans_union(spark, tmp_path):
    """Two docs share overlapping duplicated regions (doc B contains a
    LONGER shared run than doc C): coverage is the UNION of window
    intervals, never double-counted."""
    # B shares tokens 0..19 with A's head; C shares tokens 8..27 of A.
    a_toks = [f"x{i}" for i in range(28)]
    b = " ".join(a_toks[:20]) + " " + " ".join(f"b{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(10)) + " " + " ".join(a_toks[8:28])
    a = " ".join(a_toks)
    d = _write_documents(tmp_path, [(1, a), (2, b), (3, c)])
    got = {r.doc_id: r for r in dup_span_scrub(spark, d).collect()}
    # A: windows 0..8 (shared with B) and 8..16 (shared with C) are
    # duplicated; union covers tokens 0..27 = the whole doc
    assert got[1].removed_tokens == 28, got[1]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = sorted(
        tuple(x.item() if hasattr(x, "item") else x for x in row)
        for row in con.sql(DUP_SPAN_SCRUB_SQL)
        .df()
        .itertuples(index=False, name=None)
    )
    con.close()
    assert sorted(tuple(r) for r in got.values()) == want


def test_scrub_preserve_mode_keeps_original_bytes(spark, tmp_path):
    """normal_form=False (the pipeline's training-text mode): docs
    with nothing to remove come back BYTE-IDENTICAL (case, punct,
    spacing); affected docs lose exactly the shared span's characters
    plus one adjacent separator run, everything else verbatim."""
    from boilerpipe_coffee_spark.operators.textstats import (
        dup_span_scrub_df,
    )

    span = " ".join(f"sharedzz{i}" for i in range(DUP_SPAN_W + 3))
    clean = "Keep My CASE, punctuation... and   spacing!  (doc three)"
    mid = f"Head ONE, two.  {span} Tail: three!"
    end = f"Prefix words here, then boilerplate: {span}"
    rows = [(1, mid), (2, end), (3, clean), (4, "Also %s untouched" % "x")]
    d = _write_documents(tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: r
        for r in dup_span_scrub_df(
            docs.select("doc_id", "text"), normal_form=False
        ).collect()
    }
    assert got[3].scrubbed_text == clean and got[3].removed_tokens == 0
    assert got[4].removed_tokens == 0
    # mid-doc span: cut runs to the next kept token's start, so the
    # separators BEFORE the span survive and "Tail" follows directly
    assert got[1].scrubbed_text == "Head ONE, two.  Tail: three!"
    assert got[1].removed_tokens == DUP_SPAN_W + 3
    # end-of-doc span: cut extends BACK over the preceding separator
    # run to the previous kept token's end
    assert got[2].scrubbed_text == "Prefix words here, then boilerplate"
    assert got[2].removed_tokens == DUP_SPAN_W + 3


def test_scrub_preserve_unicode_fallback(spark, tmp_path):
    """A doc whose case-folding changes length (U+0130 lowercases to
    two chars) cannot be spliced by raw-byte offsets; it must fall
    back to normal form instead of cutting at corrupted positions.
    Other docs in the same batch still splice."""
    from boilerpipe_coffee_spark.operators.textstats import (
        dup_span_scrub_df,
    )

    span = " ".join(f"uq{i}" for i in range(DUP_SPAN_W + 2))
    weird = f"İstanbul Doc! {span} tail words"
    plain = f"Plain doc, with {span} inside it."
    rows = [(1, weird), (2, plain)]
    d = _write_documents(tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: r
        for r in dup_span_scrub_df(
            docs.select("doc_id", "text"), normal_form=False
        ).collect()
    }
    assert got[1].removed_tokens == DUP_SPAN_W + 2
    # normal-form fallback: lowercase tokenizer normal form, span gone
    toks = got[1].scrubbed_text.split(" ")
    assert "İstanbul".lower().startswith(toks[0][:1])
    assert all(not t.startswith("uq") for t in toks)
    # the ASCII doc in the same batch still splices verbatim
    assert got[2].scrubbed_text == "Plain doc, with inside it."


def test_oracle_guard_fires_on_mega_doc(planted_dir):
    """The static-range position join truncates a doc with more
    windows than the bound; the guard must turn that silent
    truncation into a loud error (tested at a tiny bound -- the
    production 1e6 bound is the same parameterized SQL)."""
    from boilerpipe_coffee_spark.operators.textstats import _dup_span_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    # planted docs have ~49 windows each: a bound of 10 is exceeded
    with pytest.raises(Exception, match="static range join"):
        con.sql(_dup_span_sql(max_windows=10)).fetchall()
    con.close()
