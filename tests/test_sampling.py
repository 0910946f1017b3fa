"""Deterministic sampling / data-mixing semantics that the
DuckDB-oracle comparison on the driver corpora cannot pin down
(planted source skew with known closed-form rates)."""

import pytest  # noqa: F401


def test_source_mixture_rates_cap_for_small_sources(spark, tmp_path):
    """Mixing semantics pinned on a planted skew: a source far under
    its equal share keeps EVERYTHING (rate_bp caps at 10000); the
    dominant source is downsampled toward the share.  The sampled
    token counts must respect the monotone rate ordering."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from boilerpipe_coffee_spark.operators.textstats import (
        source_mixture_sample,
    )

    rows = []
    # big source: 50 docs x 40 tokens; small source: 2 docs x 10
    for i in range(50):
        rows.append((i, " ".join(f"bigw{i}x{j}" for j in range(40)), "big"))
    for i in range(2):
        rows.append(
            (100 + i, " ".join(f"smw{i}x{j}" for j in range(10)), "small")
        )
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = {
        r.source: r
        for r in source_mixture_sample(spark, str(tmp_path)).collect()
    }
    # total 2020 tokens, budget 0.5 -> 505 per source
    assert got["small"].rate_bp == 10000  # 20 tokens << 505: keep all
    assert got["small"].sampled_docs == 2
    assert got["small"].sampled_tokens == 20
    # big: rate = 505/2000 -> 2525 bp
    assert got["big"].rate_bp == 2525
    assert 0 < got["big"].sampled_docs < 50
