"""Streaming index upsert (SURVEY.md §2.9 I7, §3.3 stage 5).

jane's reindex transaction — delete a file's old index rows, insert the
new ones — becomes ``foreachBatch`` + dynamic partition overwrite keyed
by the source document/file id. Combined with the checkpointed source,
a replayed micro-batch overwrites the same partitions with the same
rows: idempotent, hence effectively exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from jane_spark.sources.index_store import IndexStore


def start_index_upsert_stream(
    parsed_rows: DataFrame,
    store: IndexStore,
    doc_type: str,
    checkpoint_dir: str,
    doc_id_col: str = "doc_id",
    available_now: bool = True,
):
    """Write a stream of freshly parsed index rows into the store,
    replacing each arriving document's previous rows per micro-batch."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.upsert_index_for_documents(doc_type, batch_df, doc_id_col=doc_id_col)

    writer = (
        parsed_rows.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
