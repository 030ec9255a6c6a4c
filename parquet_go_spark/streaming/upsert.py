"""Streaming CDC apply: a stream of keyed records upserts into a PGS
store via ``foreachBatch`` — each micro-batch replaces matching keys
and inserts the rest (operators/deletes.py upsert_by_key), the
change-data-capture consumption pattern (Iceberg MERGE-per-batch).

Semantics: convergent at-least-once. A replayed micro-batch re-runs the
same upsert; re-deleting tombstones nothing new on unchanged rows and
re-tombstones the previously appended rows before appending identical
replacements, so the store converges to the same content (pinned by
test). A crash between the tombstone commit and the append leaves the
keys deleted until the retry lands — the documented two-commit window
of upsert_by_key. Single-writer like every store mutation: one stream
owns the store.

No analog in the reference (immutable files, no streams); this
composes the task-mandated streaming surface with the mutable-table
layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.deletes import upsert_by_key


def upsert_stream(
    stream: DataFrame,
    path: str,
    key_cols: list[str] | str,
    checkpoint: str,
    read_options: dict | None = None,
    write_options: dict | None = None,
    trigger: dict | None = None,
):
    """Start the CDC-apply query. The store must already exist (the
    first batch needs a schema/layout to match); returns the streaming
    query handle."""
    spark = stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # last-write-wins INSIDE a batch: one row per key, newest by
        # position in the batch is not defined for unordered sources, so
        # require the batch itself to be key-unique after dropDuplicates
        batch = batch_df.dropDuplicates(
            [key_cols] if isinstance(key_cols, str) else key_cols
        )
        upsert_by_key(spark, path, batch, key_cols,
                      read_options, write_options)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
