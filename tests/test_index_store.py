"""Index-store + ingest-sync tests (SURVEY.md P3/P4): document
versioning/dedup, typed index upsert, filesystem delta detection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jane_spark.sources.index_store import IndexStore
from jane_spark.sources.ingest import delta_files, deleted_files
from jane_spark.testing.fixtures import fs_snapshots


def _t(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def store(spark, tmp_path):
    return IndexStore(spark, str(tmp_path / "store"))


DOC_COLS = ["doc_id", "doc_type", "name", "content_type", "data", "created_at", "version"]


def test_document_versioning_and_sha_dedup(spark, store):
    docs = spark.createDataFrame(
        [
            ("d1", "stationxml", "bw.xml", "text/xml", b"<v1/>", _t("2023-01-01T00:00:00"), 1),
            ("d2", "stationxml", "bw.xml", "text/xml", b"<v2/>", _t("2023-02-01T00:00:00"), 2),
            # re-upload of v2 bytes (same sha1) — must collapse (I6)
            ("d3", "stationxml", "bw.xml", "text/xml", b"<v2/>", _t("2023-03-01T00:00:00"), 3),
            ("d4", "quakeml", "cat.xml", "text/xml", b"<q/>", _t("2023-01-01T00:00:00"), 1),
        ],
        DOC_COLS,
    )
    store.write_documents(docs)
    stored = store.documents("stationxml")
    assert stored.count() == 3
    assert {r["sha1"] for r in stored.collect()} != set()  # computed on write
    latest = store.latest_documents("stationxml").collect()
    assert len(latest) == 1
    assert latest[0]["doc_id"] in ("d2", "d3")  # same content either way
    assert latest[0]["filesize"] == 5


def test_index_upsert_replaces_per_document(spark, store):
    rows_v1 = spark.createDataFrame(
        [("d1", "BW", 1.0), ("d1", "BW", 2.0), ("d2", "GR", 3.0)],
        ["doc_id", "network", "val"],
    )
    store.upsert_index_for_documents("stationxml", rows_v1)
    assert store.index("stationxml").count() == 3

    # reindex d1 only: its old rows must vanish, d2 untouched (I7)
    rows_v2 = spark.createDataFrame([("d1", "BW", 9.0)], ["doc_id", "network", "val"])
    store.upsert_index_for_documents("stationxml", rows_v2)
    got = {(r["doc_id"], r["val"]) for r in store.index("stationxml").collect()}
    assert got == {("d1", 9.0), ("d2", 3.0)}


def test_fs_delta_and_deletions(spark):
    before, after = fs_snapshots(spark)
    changed = {r["path"] for r in delta_files(after, before).collect()}
    assert changed == {"/data/f2.mseed", "/data/f4.mseed"}  # touched + new
    gone = {r["path"] for r in deleted_files(after, before).collect()}
    assert gone == {"/data/f3.mseed"}


def test_index_partition_pruning(spark, store):
    """The partition layout must actually prune: filter on the partition
    key reads only that partition's files (PartitionFilters in plan)."""
    rows = spark.createDataFrame(
        [("BW", 2023, "ALTM", 1.0), ("GR", 2023, "FUR", 2.0), ("BW", 2024, "MANZ", 3.0)],
        ["network", "year", "station", "val"],
    )
    store.write_index("trace", rows, partition_cols=["network", "year"],
                      sort_cols=["station"])
    scan = store.index("trace").filter((F.col("network") == "BW") & (F.col("year") == 2023))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "network" in plan.split("PartitionFilters")[1][:200]
    assert scan.collect()[0]["station"] == "ALTM"


def test_export_corpus_layout_and_counts(spark, sf_dir, tmp_path):
    """Export writes hive partitions split=*/lang=*, at most `shards`
    files per partition, read-back totals equal input, and a re-export
    (overwrite) is byte-stable on counts."""
    from pyspark.sql import functions as F

    from jane_spark.engine.catalog import Catalog
    from jane_spark.functions.sampling import split_assign
    from jane_spark.sources.corpus_export import export_corpus, export_manifest

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        "text",
        "lang",
        split_assign(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split:"
        ).alias("split"),
    )
    out = str(tmp_path / "corpus")
    export_corpus(docs, out, ("split", "lang"), shards=2, shard_key="doc_id")

    m = export_manifest(spark, out, ("split", "lang")).collect()
    assert sum(r["n_rows"] for r in m) == docs.count()
    assert all(r["n_files"] <= 2 for r in m)
    assert {r["split"] for r in m} <= {"train", "val", "test"}

    back = spark.read.parquet(out)
    assert set(back.columns) == {"doc_id", "text", "lang", "split"}
    assert back.select("doc_id").distinct().count() == docs.count()

    export_corpus(docs, out, ("split", "lang"), shards=2, shard_key="doc_id")
    m2 = export_manifest(spark, out, ("split", "lang")).collect()
    assert sorted(map(tuple, m)) == sorted(map(tuple, m2))
