"""Iceberg path self-verification.

The sandbox has no Iceberg runtime jars (documented environment
limit), so the end-to-end test SKIPS here -- but it activates
automatically the day the jars appear on the classpath, proving the
write_output/read_interleaved Iceberg branches and the
snapshot-resume contract without any code change."""

import pytest


def _iceberg_ready(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_catalog_detection(spark):
    from boilerpipe_coffee_spark.sources import iceberg_available

    assert not iceberg_available(spark)  # vanilla session: parquet path
    try:
        spark.conf.set(
            "spark.sql.catalog.bpc_probe",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        # detection keys off the catalog named in the table identifier
        assert iceberg_available(spark, "bpc_probe")
        assert not iceberg_available(spark, "other")
        assert not iceberg_available(spark)  # not a conventional name
    finally:
        spark.conf.unset("spark.sql.catalog.bpc_probe")


def test_iceberg_snapshot_resume(spark, tmp_path):
    """Write -> append -> time-travel back to the first committed
    snapshot: the resume primitive the pipeline's metrics/lineage
    checkpointing relies on at production (BASELINE.json north rule:
    'resumes from the last committed snapshot')."""
    if not _iceberg_ready(spark):
        pytest.skip(
            "Iceberg runtime jars absent in this sandbox; "
            "self-activates where Iceberg is present"
        )

    from boilerpipe_coffee_spark.operators import extract
    from boilerpipe_coffee_spark.sources import (
        read_interleaved,
        synth_interleaved,
        write_output,
    )

    cat = "bpc_it"
    tbl = f"{cat}.db.extract_out"
    try:
        spark.conf.set(
            f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
        spark.conf.set(
            f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "wh")
        )

        docs = synth_interleaved(spark, 40, seed=42)
        batch1 = docs.filter("doc_id < 'doc-00000020'")
        batch2 = docs.filter("doc_id >= 'doc-00000020'")

        # create (bucket(doc_id) hidden partitioning) + append
        write_output(extract(batch1, "ArticleExtractor"), tbl)
        snaps1 = spark.sql(
            f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at"
        ).collect()
        assert len(snaps1) == 1
        n1 = spark.table(tbl).count()
        assert n1 == 20

        write_output(extract(batch2, "ArticleExtractor"), tbl)
        snaps2 = spark.sql(
            f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at"
        ).collect()
        assert len(snaps2) == 2
        assert spark.table(tbl).count() == 40

        # snapshot-resume: pin the first committed snapshot and get
        # exactly the pre-append table state back
        old = (
            spark.read.format("iceberg")
            .option("snapshot-id", snaps1[0].snapshot_id)
            .load(tbl)
        )
        assert old.count() == n1
        assert set(r.doc_id for r in old.select("doc_id").collect()) == set(
            r.doc_id for r in batch1.select("doc_id").collect()
        )

        # the reader helper routes table identifiers through the
        # Iceberg branch and projects the two pipeline columns
        ri = read_interleaved(spark, tbl)
        assert ri.columns == ["doc_id", "spans"]
        assert ri.count() == 40
    finally:
        for k in (
            f"spark.sql.catalog.{cat}",
            f"spark.sql.catalog.{cat}.type",
            f"spark.sql.catalog.{cat}.warehouse",
        ):
            try:
                spark.conf.unset(k)
            except Exception:
                pass
