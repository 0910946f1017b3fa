"""extract_parity: the driver-visible extraction-correctness query.

Green path is covered by the driver mimic (test_entry_queries); here we
prove the diff machinery itself -- zero counts on the committed golden,
and NONZERO counts the moment the golden (stand-in for a drifted
extractor) disagrees, including on error rows whose span fields are
null (the null-safe join path)."""

import duckdb
import pytest

from boilerpipe_coffee_spark.operators import parity


def test_parity_green_on_committed_golden(spark):
    rows = parity.extract_parity(spark, "unused").collect()
    assert [r.extractor for r in rows] == sorted(parity.FLAGSHIP_EXTRACTORS)
    for r in rows:
        assert r.n_docs == 300
        assert r.n_rows > 0
        assert r.missing_rows == 0, r
        assert r.extra_rows == 0, r


def test_parity_detects_drift(spark, tmp_path, monkeypatch):
    """Doctor the golden three ways -- mutate one span text, drop one
    row, duplicate one row -- and the per-extractor counts must light
    up exactly there while untouched extractors stay zero."""
    doctored = str(tmp_path / "doctored.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          WITH g AS (
            SELECT *, row_number() OVER (
              PARTITION BY extractor ORDER BY doc_id, out_order) AS rn
            FROM read_parquet('{parity.GOLDEN_PATH}')
          )
          SELECT extractor, doc_id,
                 CASE WHEN extractor = 'ArticleExtractor' AND rn = 1
                      THEN 'DRIFTED TITLE' ELSE title END AS title,
                 error, kind,
                 CASE WHEN extractor = 'ArticleExtractor' AND rn = 1
                      THEN 'DRIFTED TEXT' ELSE text END AS text,
                 media_ref, out_order
          FROM g
          WHERE NOT (extractor = 'DefaultExtractor' AND rn = 1)  -- drop
          UNION ALL
          SELECT extractor, doc_id, title, error, kind, text, media_ref,
                 out_order
          FROM g WHERE extractor = 'Unfiltered' AND rn = 1        -- dup
        ) TO '{doctored}' (FORMAT PARQUET)
        """
    )
    con.close()
    monkeypatch.setattr(parity, "GOLDEN_PATH", doctored)
    rows = {r.extractor: r for r in parity.extract_parity(spark, "x").collect()}
    art = rows["ArticleExtractor"]
    assert art.missing_rows >= 1 and art.extra_rows >= 1  # mutated row
    de = rows["DefaultExtractor"]
    assert de.missing_rows == 0 and de.extra_rows == 1  # golden lost a row
    un = rows["Unfiltered"]
    assert un.missing_rows == 1 and un.extra_rows == 0  # golden gained a dup
    for name in ("LargestContentExtractor", "KeepEverythingExtractor"):
        assert rows[name].missing_rows == 0
        assert rows[name].extra_rows == 0
