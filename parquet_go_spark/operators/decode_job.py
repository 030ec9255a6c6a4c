"""Decode job: blobs -> reconstructed rows (the reference read path,
SURVEY.md §3.2, fully distributed).

Each partition's column blobs are regrouped by part_id and decoded in one
applyInArrow kernel; the output schema is the original table schema. Row
order within a partition is preserved by the frames themselves (frames are
row-aligned by construction); global order is not guaranteed — equality is
order-insensitive, which verify.py's checksum/exceptAll handles, matching
the reference's roundtrip tests (reader/read_test.go:366-391).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import chunk, keys as keysmod
from ..frame import CRC_MODES as frame_CRC_MODES
from .store import ManifestStore


def make_decode_fn(
    columns: list[str],
    spark_schema: str,
    arrow_types: dict[str, pa.DataType] | None = None,
    encryption_key: bytes | None = None,
    column_keys: dict[str, bytes] | None = None,
    key_retriever=None,
    crc_mode: str = "strict",
    aad_prefix: bytes = b"",
    case_insensitive: bool = False,
):
    """Per-partition decode kernel; ``arrow_types`` restores exact logical
    types (e.g. timestamp[us]) when the frame's physical type is wider.
    ``column_keys``/``encryption_key``/``key_retriever`` follow the
    reference's resolveColumnKey fallback chain
    (reader/encryption.go:311-366, WithKeyRetriever reader/options.go).
    ``crc_mode``/``aad_prefix`` are the reference's WithCRCMode /
    WithAADPrefix read options; ``case_insensitive`` matches requested
    column names to stored chunks the way WithCaseInsensitive does
    (reader/options.go:30-33), erroring on an ambiguous match.

    A dotted name (``payload.meta.lang``) projects a nested subtree via
    ``decode_chunk_partial`` — sibling sub-frames never hit a decode
    kernel (the reference's ReadPartial, reader/reader.go:347-410). The
    output column is named with dots replaced by underscores."""

    out_names = [c.replace(".", "_") for c in columns]

    def _resolve(top: str, cols: dict) -> str:
        if top in cols and not case_insensitive:
            return top
        if case_insensitive:
            hits = [c for c in cols if c.lower() == top.lower()]
            if len(hits) > 1:
                raise ValueError(
                    f"column {top!r} ambiguously matches {sorted(hits)} "
                    "with case-insensitive matching enabled"
                )
            if hits:
                return hits[0]
        raise ValueError(f"partition missing column chunk {top!r}")

    def decode_group(table: pa.Table) -> pa.Table:
        cols = {c: b for c, b in zip(table.column("col").to_pylist(),
                                     table.column("blob").to_pylist())}
        arrays = []
        from .. import frame as framemod

        for name in columns:
            top, _, sub = name.partition(".")
            top = _resolve(top, cols)
            try:
                opts = framemod.ReadOptions(
                    key=keysmod.key_for(top, column_keys, encryption_key,
                                        key_retriever),
                    aad_prefix=aad_prefix,
                    crc_mode=crc_mode,
                )
                a = (
                    chunk.decode_chunk_partial(cols[top], sub, opts)
                    if sub
                    else chunk.decode_chunk(cols[top], opts)
                )
            except ValueError as e:
                # name the column: a wrong/missing per-column key should
                # be attributable (reference error style, encryption.go)
                raise ValueError(f"column {name!r}: {e}") from e
            want = (arrow_types or {}).get(name)
            if want is not None and a.type != want:
                a = a.cast(want)
            arrays.append(a)
        n = len(arrays[0])
        for name, a in zip(columns, arrays):
            if len(a) != n:
                raise ValueError(f"column {name} count mismatch: {len(a)} != {n}")
        return pa.table(dict(zip(out_names, arrays)))

    return decode_group


def decode_table(
    spark: SparkSession,
    out_dir: str,
    columns: list[str],
    spark_schema: str,
    encryption_key: bytes | None = None,
    column_keys: dict[str, bytes] | None = None,
    key_retriever=None,
    crc_mode: str = "strict",
    aad_prefix: bytes = b"",
    case_insensitive: bool = False,
) -> DataFrame:
    if crc_mode not in frame_CRC_MODES:
        raise ValueError(f"crc_mode must be one of {frame_CRC_MODES}")
    store = ManifestStore(out_dir)
    tops = sorted({c.split(".", 1)[0] for c in columns})
    blobs = store.blobs(spark)
    if case_insensitive:
        blobs = blobs.filter(
            F.lower(F.col("col")).isin([t.lower() for t in tops])
        )
    else:
        blobs = blobs.filter(F.col("col").isin(tops))
    return blobs.groupBy("part_id").applyInArrow(
        make_decode_fn(columns, spark_schema, encryption_key=encryption_key,
                       column_keys=column_keys, key_retriever=key_retriever,
                       crc_mode=crc_mode, aad_prefix=aad_prefix,
                       case_insensitive=case_insensitive),
        schema=spark_schema,
    )


def decode_rows(
    spark: SparkSession,
    out_dir: str,
    columns: list[str],
    spark_schema: str,
    offset: int,
    count: int,
    encryption_key: bytes | None = None,
    column_keys: dict[str, bytes] | None = None,
) -> DataFrame:
    """SkipRows analog: decode rows [offset, offset+count) in
    (part_id, intra-partition) order.

    The manifest's per-partition row counts are the OffsetIndex
    (FirstRowIndex, reader/columnbuffer_offset_index.go:23-110): a
    driver-side cumulative scan — metadata-bounded, like the reference's
    footer read — finds the partitions that intersect the range; only
    those are decoded (the part_id IN filter is pushed to the blob scan),
    and the edge partitions are sliced inside the decode kernel so
    skipped rows are never materialized."""
    store = ManifestStore(out_dir)
    counts = (
        store.manifest(spark)
        .filter(F.col("col") == columns[0])
        .select("part_id", "count")
        .orderBy("part_id")
        .collect()
    )
    first_row = {}
    acc = 0
    for r in counts:
        first_row[r["part_id"]] = acc
        acc += r["count"]
    lo, hi = offset, offset + count
    wanted = {
        pid: (max(lo - fr, 0), min(hi - fr, cnt))
        for (pid, fr), cnt in zip(first_row.items(), (r["count"] for r in counts))
        if fr < hi and fr + cnt > lo
    }
    def decode_slice(table: pa.Table) -> pa.Table:
        pid = table.column("part_id")[0].as_py()
        s, e = wanted[pid]
        cols = {c: b for c, b in zip(table.column("col").to_pylist(),
                                     table.column("blob").to_pylist())}
        arrays = []
        for name in columns:
            if name not in cols:
                raise ValueError(f"partition missing column chunk {name!r}")
            # page-granular skip: only page frames intersecting [s, e) are
            # decompressed; a bare single-frame chunk decodes then slices
            arrays.append(chunk.decode_chunk_rows(
                cols[name], s, e,
                encryption_key=keysmod.key_for(name, column_keys,
                                               encryption_key),
            ))
        return pa.table(dict(zip(columns, arrays)))

    blobs = (
        store.blobs(spark)
        .filter(F.col("part_id").isin(list(wanted)))
        .filter(F.col("col").isin(columns))
    )
    return blobs.groupBy("part_id").applyInArrow(
        decode_slice, schema=spark_schema
    )
