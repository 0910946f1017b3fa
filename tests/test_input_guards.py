"""Input-validation guards (ADVICE r3): corrupt interchange lines must
fail fast, odd doc_id dtypes must be rejected loudly, and null/ragged
embedding vectors must produce a data-validation message."""

import numpy as np
import pandas as pd
import pytest


def test_jsonl_failfast_on_corrupt_line(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    from boilerpipe_coffee_spark.sources import read_interleaved_jsonl

    p = tmp_path / "docs.jsonl"
    good = (
        '{"doc_id": "d1", "spans": [{"kind": "text", "text": "<p>hi</p>",'
        ' "media_ref": null, "offset": 0}]}'
    )
    p.write_text(good + "\n" + good[: len(good) // 2] + "\n")  # truncated
    with pytest.raises(Py4JJavaError):
        read_interleaved_jsonl(spark, str(p)).collect()


def test_jsonl_reads_clean_file(spark, tmp_path):
    from boilerpipe_coffee_spark.sources import read_interleaved_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": "d1", "spans": [{"kind": "text", "text": "<p>hi</p>",'
        ' "media_ref": null, "offset": 0}]}\n'
    )
    rows = read_interleaved_jsonl(spark, str(p)).collect()
    assert rows[0].doc_id == "d1"
    assert rows[0].spans[0].text == "<p>hi</p>"


def test_signature_stage_rejects_exotic_doc_id(spark):
    from boilerpipe_coffee_spark.operators.dedup import minhash_sigs_df

    df = spark.createDataFrame(
        [(1.5, "some text here")], "doc_id double, text string"
    )
    with pytest.raises(TypeError, match="doc_id dtype"):
        minhash_sigs_df(df)


def test_signature_stage_accepts_int_doc_id(spark):
    from boilerpipe_coffee_spark.operators.dedup import minhash_sigs_df

    df = spark.createDataFrame(
        [(7, "a few tokens of text for shingling here")],
        "doc_id int, text string",
    )
    out = minhash_sigs_df(df)
    assert dict(out.dtypes)["doc_id"] == "bigint"
    assert out.count() == 1


def test_stack_vectors_messages():
    from boilerpipe_coffee_spark.operators.similarity import (
        DIM,
        _stack_vectors,
    )

    ok = _stack_vectors(pd.Series([np.zeros(DIM), np.ones(DIM)]))
    assert ok.shape == (2, DIM)
    with pytest.raises(ValueError, match="null vector"):
        _stack_vectors(pd.Series([np.zeros(DIM), None]))
    with pytest.raises(ValueError, match="length"):
        _stack_vectors(pd.Series([np.zeros(DIM), np.zeros(DIM - 1)]))
