"""Changelog reads over a PGS store: the Iceberg incremental-changelog
(CDC) analog, completing ``since_commit`` with delete events.

``read_changes(spark, path, since, until)`` returns one DataFrame of
change events for the snapshot window ``(since, until]``:

  * ``insert`` rows — full data columns plus the row's address
    (``_pgs_part``/``_pgs_pos``) and arrival snapshot (``_pgs_commit``).
    This is exactly the documented incremental-read pattern
    (``since_commit=k`` + a caller cap on ``_pgs_commit``), so already-
    consumed partitions' metadata and bytes are never touched.
  * ``delete`` rows — ADDRESSES ONLY (data columns null), tagged with
    the snapshot that was current when the tombstone committed. Content
    is deliberately withheld: positional deletes are takedowns (PII,
    opt-outs), and a changelog that replayed the deleted bytes would
    defeat them. A consumer mirrors the store by keying on the address:
    it captured the content from the row's own ``insert`` event.

Replay contract (pinned by tests): a mirror synced with
``as_of_commit=s`` (``with_pos``) and then applied
``read_changes(s, now)`` — inserts of commit k before deletes tagged
``at=k``, deletes of unknown addresses ignored — equals the current
read. The "ignored unknown address" rule is load-bearing: every read
(including the initial sync) already applies ALL committed tombstones,
so a delete event can reference an address the consumer never saw; the
net state is identical either way.

Scope: batch-writer stores on the main timeline. Equality-delete
commits are key predicates, not addresses — a window crossing one is
refused (``compact_store`` materializes them away). Stream stores are
refused (their incremental twin is the streaming source). The
reference has no mutable-table surface at all (files are immutable);
this rounds out the Iceberg table-layer analog built on top of it.

At 100 TB: the insert side is the ``since_commit`` pruned read (pure
metadata part-id floor — no consumed partition is listed or opened);
the delete side reads only the window's tombstone parquet (row
addresses, metadata-scale relative to data) with one small shuffle to
deduplicate addresses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pgs_datasource import (
    CHANGE_COL,  # noqa: F401  (canonical home; re-exported for callers)
    _hist_state,
    _meta,
    register,
)


def read_changes_between_timestamps(
    spark: SparkSession,
    path: str,
    since_ts,
    until_ts=None,
    read_options: dict | None = None,
) -> DataFrame:
    """CDC window addressed by wall-clock (Iceberg's
    start/end-timestamp incremental read): each bound resolves to the
    latest snapshot committed at or before it via the lockstep
    ``history_ts`` clock, then the ordinary snapshot-window changelog
    runs. A ``since_ts`` before the first addressable commit refuses
    (same contract as an expired cursor: re-sync from a full scan)."""
    from ..sources.pgs_datasource import _parse_ts_us, _resolve_as_of_ts

    meta = _meta(path)
    k = _resolve_as_of_ts(meta, _parse_ts_us(since_ts))
    until = (None if until_ts is None
             else _resolve_as_of_ts(meta, _parse_ts_us(until_ts)))
    return read_changes(spark, path, k, until, read_options)


def read_changes(
    spark: SparkSession,
    path: str,
    since_commit: int,
    until_commit: int | None = None,
    read_options: dict | None = None,
) -> DataFrame:
    """Change events for the snapshot window ``(since_commit,
    until_commit]`` (``until_commit`` defaults to the current snapshot).
    ``since_commit == until_commit`` is a valid empty window."""
    register(spark)
    meta = _meta(path)
    if meta.get("clustering") == "stream_append":
        raise ValueError(
            "changelog reads apply to batch-writer stores; a stream "
            "store's incremental twin is the streaming source "
            "(spark.readStream.format('pgs'))"
        )
    hist, base, _ = _hist_state(meta)
    if not hist:
        raise ValueError(
            "store records no append-commit history "
            "(operator-written or pre-history store)"
        )
    now = base + len(hist)
    k = int(since_commit)
    until = now if until_commit is None else int(until_commit)
    if not base <= k <= now:
        raise ValueError(
            f"since_commit {k} out of range: store has snapshots "
            f"{base + 1}..{now} (earlier ones expired — an expired "
            "cursor must re-sync from a full scan)"
        )
    if not k <= until <= now:
        raise ValueError(
            f"until_commit {until} out of range: must be in "
            f"[{k}, {now}]"
        )
    for e in meta.get("eq_deletes") or []:
        at = e.get("at")
        if at is None or k < at <= until:
            raise ValueError(
                f"window ({k}, {until}] crosses equality-delete commit "
                f"{e['name']!r}: equality deletes are key predicates, "
                "not row addresses, and have no changelog events — "
                "compact_store materializes them into a delete-free "
                "store"
            )
    ents = []
    for e in meta.get("deletes") or []:
        at = e.get("at")
        if at is None:
            raise ValueError(
                f"tombstone entry {e['name']!r} predates changelog "
                "tagging (no 'at' snapshot recorded) — compact_store "
                "materializes it into a delete-free store"
            )
        if k < at <= until:
            ents.append(e)

    # insert side: the documented incremental-read pattern. No pushdown
    # opt-in — the returned DataFrame leaves the one-load-per-query
    # discipline (the caller may run several differently-filtered
    # actions on it), which is exactly the engine scan-cache hazard.
    reader = (
        spark.read.format("pgs")
        .option("with_pos", "true").option("with_commit", "true")
        .option("since_commit", str(k))
    )
    for opt, val in (read_options or {}).items():
        reader = reader.option(opt, val)
    ins = reader.load(path)
    if until < now:
        ins = ins.filter(F.col("_pgs_commit") <= F.lit(until))
    ins = ins.withColumn(CHANGE_COL, F.lit("insert"))
    if not ents:
        return ins

    types = {f.name: f.dataType for f in ins.schema.fields}
    dels = None
    for e in ents:
        d = spark.read.parquet(os.path.join(path, "deletes", e["name"]))
        d = d.select(
            F.col("part_id").cast(types["_pgs_part"]).alias("_pgs_part"),
            F.col("pos").cast(types["_pgs_pos"]).alias("_pgs_pos"),
            F.lit(e["at"]).cast(types["_pgs_commit"])
            .alias("_pgs_commit"),
        )
        dels = d if dels is None else dels.unionByName(d)
    # one address, one event: the earliest tag wins (positional entries
    # cannot re-address a tombstoned row — later scans no longer see it —
    # but compact_tombstones merges dirs, so stay defensive)
    dels = (
        dels.groupBy("_pgs_part", "_pgs_pos")
        .agg(F.min("_pgs_commit").alias("_pgs_commit"))
        .withColumn(CHANGE_COL, F.lit("delete"))
    )
    # data columns null on delete events (takedown semantics)
    return ins.unionByName(dels, allowMissingColumns=True)


# --------------------------------------------------------------- driver query

def ds_changes_feed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog over a store taken through write -> append ->
    delete_where -> append: the window (1, now] carries the two appended
    commits' rows (minus takedowns, which every read drops) plus the
    delete-address events tagged with the snapshot current at the
    takedown. Aggregated per (event type, snapshot) so the oracle can
    re-derive the feed from the source table alone — addresses are
    engine-assigned, but their counts and the insert rows' content are
    exact."""
    import shutil

    from .deletes import delete_where

    register(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = os.path.join(
        "/tmp", f"pgs_ds_changes_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(out, ignore_errors=True)
    w = docs.repartition(2).write.format("pgs")
    w.mode("overwrite").save(out)  # snapshot 1 (full table)
    (
        docs.filter("doc_id % 3 = 1").repartition(2)
        .write.format("pgs").mode("append").save(out)
    )  # snapshot 2
    delete_where(spark, out, "lang = 'de'")  # tagged at=2
    (
        docs.filter("doc_id % 3 = 2").repartition(2)
        .write.format("pgs").mode("append").save(out)
    )  # snapshot 3
    ch = read_changes(spark, out, since_commit=1)
    return ch.groupBy(
        F.col(CHANGE_COL).alias("change"),
        F.col("_pgs_commit").alias("snap"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_doc"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# Window (1, 3] of the store built above:
#   inserts snap 2: the appended doc_id % 3 = 1 rows, minus lang='de'
#     (the takedown scan saw snapshots 1-2, and every read drops
#     tombstoned rows — including this changelog's insert side);
#   inserts snap 3: the appended doc_id % 3 = 2 rows, all of them (the
#     takedown predates them);
#   deletes at snap 2: one address per lang='de' ROW present in
#     snapshots 1-2 — the full table (snapshot 1) plus the % 3 = 1
#     append, so a % 3 = 1 'de' doc contributes TWO addresses — with
#     null data columns (takedown semantics).
DS_CHANGES_FEED_ORACLE = """
SELECT 'insert' AS change, CAST(2 AS BIGINT) AS snap,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM documents WHERE doc_id % 3 = 1 AND lang <> 'de'
UNION ALL
SELECT 'insert', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT), min(doc_id), max(doc_id)
FROM documents WHERE doc_id % 3 = 2
UNION ALL
SELECT 'delete', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (
  SELECT doc_id FROM documents WHERE lang = 'de'
  UNION ALL
  SELECT doc_id FROM documents WHERE lang = 'de' AND doc_id % 3 = 1
) t
"""
