"""Schema evolution on a PGS store: add / rename / drop columns without
rewriting data.

The reference's schema is fixed at write time (a parquet-go file is
immutable; schema/schemahandler.go builds it once) — but a long-lived
100 TB table changes shape: new quality/label columns arrive, fields get
better names, obsolete ones retire. This is the Iceberg schema-evolution
analog over our store layout, with **presence-based resolution** instead
of field ids:

  * ``add_column``: the column joins the recorded schema plus an
    ``added_columns`` meta entry carrying its default. Partitions
    written before the change have no chunk of that name, so reads
    synthesize the default; later appends encode it like any column.
    Adding a name for which any committed chunk already exists is
    refused — that is exactly the dropped-then-re-added collision field
    ids exist to solve, and refusing it keeps resolution presence-based
    (compaction-stable: rewritten partitions need no id translation).
  * ``rename_column``: metadata only. ``column_renames`` maps the
    current name to every historical name; reads resolve per partition
    to whichever alias is physically present, and stats/bloom/page
    pruning consult the aliases too, so a renamed range column keeps
    pruning. Appends write the new name.
  * ``drop_column``: the column leaves the recorded schema; chunks stay
    on disk (invisible) until compaction rewrites them away — re-adding
    the same name is refused until then (see above).

All three are metadata commits (the atomic store-meta replace), same
protocol as the writers. Compaction MATERIALIZES evolution completely:
an evolved store forces every partition through the recode arm, so the
destination's chunks carry current names with defaults filled in and
retired chunks gone, and the destination carries no evolution metadata
at all — which is also what frees a retired name for re-use.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import types as T
from pyspark.sql.types import StructField, StructType

from ..sources.pgs_datasource import (
    _dataset, _has_blobs, _meta, _require_no_branches, _write_meta,
)

_SCALAR_DEFAULTS = (type(None), bool, int, float, str)

_SIMPLE_TYPES = {
    "boolean": T.BooleanType, "bool": T.BooleanType,
    "byte": T.ByteType, "tinyint": T.ByteType,
    "short": T.ShortType, "smallint": T.ShortType,
    "int": T.IntegerType, "integer": T.IntegerType,
    "long": T.LongType, "bigint": T.LongType,
    "float": T.FloatType, "real": T.FloatType,
    "double": T.DoubleType,
    "string": T.StringType, "binary": T.BinaryType,
    "date": T.DateType, "timestamp": T.TimestampType,
    "timestamp_ntz": T.TimestampNTZType,
}


def _parse_ddl_type(ddl: str) -> T.DataType:
    """Spark DDL type string -> DataType without a live SparkContext
    (evolution is a metadata operation; it must work from a bare CLI).
    Covers scalars, decimal, and array nesting; anything fancier falls
    back to Spark's own parser, which needs an active session."""
    s = ddl.strip().lower()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]()
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array\s*<(.+)>", s)
    if m:
        return T.ArrayType(_parse_ddl_type(m.group(1)))
    return StructType.fromDDL(f"`c` {ddl}")[0].dataType


def _load_schema(path: str, meta: dict) -> StructType:
    if meta.get("clustering") == "stream_append":
        # the sink re-records its own schema on every micro-batch commit,
        # which would silently revert a metadata-only evolution — and a
        # running stream's appends would stop matching the evolved
        # schema anyway. Stop the stream and compact first.
        raise ValueError(
            "schema evolution on a stream-written store would be undone "
            "by the sink's next commit; stop the stream and compact the "
            "store, then evolve the compacted store"
        )
    if not meta.get("schema_json"):
        raise ValueError(
            "store records no schema (operator-written or legacy store); "
            "schema evolution needs a datasource-written store"
        )
    return StructType.fromJson(meta["schema_json"])


def _committed_chunk_names(path: str) -> set[str]:
    if not _has_blobs(path):
        return set()
    t = _dataset(path).to_table(columns=["col"])
    return set(t.column("col").to_pylist())


def _guard_untouchable(meta: dict, name: str, op: str) -> None:
    if name in (meta.get("shredded") or {}):
        raise ValueError(f"cannot {op} shredded variant column {name!r}")
    if name in (meta.get("column_key_cols") or []):
        raise ValueError(
            f"cannot {op} column {name!r}: chunks are sealed under a "
            "per-column key bound to this name"
        )
    if op != "add" and name == meta.get("key_col"):
        raise ValueError(
            f"cannot {op} the store's clustering key column {name!r}"
        )


def add_column(
    path: str, name: str, ddl_type: str, default=None
) -> None:
    """Add ``name`` (a Spark DDL type string, e.g. ``"double"``) with an
    optional scalar default for pre-existing partitions."""
    if not isinstance(default, _SCALAR_DEFAULTS):
        raise ValueError("default must be a JSON scalar (or None)")
    meta = _meta(path)
    _require_no_branches(meta, "add_column")
    schema = _load_schema(path, meta)
    if name in schema.fieldNames() or name == "part_id" or \
            name.startswith("_pgs_"):
        raise ValueError(f"column name {name!r} is taken or reserved")
    if name in _committed_chunk_names(path):
        raise ValueError(
            f"chunks named {name!r} already exist in the store (a dropped "
            "column?); compact to retire them, or pick another name"
        )
    dtype = _parse_ddl_type(ddl_type)
    json.dumps(default)  # must survive the meta file round-trip
    if default is not None:
        # a miscast default would fail on EVERY later read of every
        # pre-evolution partition — validate at the commit point
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        try:
            pa.array([default]).cast(to_arrow_type(dtype))
        except Exception as e:
            raise ValueError(
                f"default {default!r} is not castable to {ddl_type}: {e}"
            ) from e
    schema = StructType(schema.fields + [StructField(name, dtype)])
    meta["schema_json"] = schema.jsonValue()
    meta.setdefault("added_columns", {})[name] = {"default": default}
    _write_meta(path, meta)  # THE commit point


def rename_column(path: str, old: str, new: str) -> None:
    """Rename ``old`` to ``new`` — metadata only; every partition keeps
    its bytes and reads resolve the physical alias per partition."""
    meta = _meta(path)
    _require_no_branches(meta, "rename_column")
    schema = _load_schema(path, meta)
    if old not in schema.fieldNames():
        raise ValueError(f"no column {old!r} in the store schema")
    if new in schema.fieldNames() or new == "part_id" or \
            new.startswith("_pgs_"):
        raise ValueError(f"column name {new!r} is taken or reserved")
    _guard_untouchable(meta, old, "rename")
    if new in _committed_chunk_names(path) - {old}:
        raise ValueError(
            f"chunks named {new!r} already exist in the store; compact to "
            "retire them, or pick another name"
        )
    meta["schema_json"] = StructType(
        [StructField(new, f.dataType, f.nullable) if f.name == old else f
         for f in schema.fields]
    ).jsonValue()
    renames = meta.setdefault("column_renames", {})
    # carry the full alias history so partitions of ANY era resolve
    aliases = [old] + renames.pop(old, [])
    renames[new] = aliases
    added = meta.get("added_columns") or {}
    if old in added:
        added[new] = added.pop(old)
    # equality-delete entries key on LOGICAL names (their parquet files
    # keep the physical file_cols); the rename must follow or readers
    # would resolve a stale name against new partitions
    for e in meta.get("eq_deletes") or []:
        e["key_cols"] = [new if c == old else c for c in e["key_cols"]]
    if meta.get("bloom_cols") and old in meta["bloom_cols"]:
        meta["bloom_cols"] = sorted(
            {new if c == old else c for c in meta["bloom_cols"]}
        )
    if meta.get("ndv_cols") and old in meta["ndv_cols"]:
        meta["ndv_cols"] = sorted(
            {new if c == old else c for c in meta["ndv_cols"]}
        )
    _write_meta(path, meta)


def drop_column(path: str, name: str) -> None:
    """Drop ``name`` from the recorded schema. Bytes stay until
    compaction rewrites the partitions (like Iceberg, a drop is a
    metadata operation, not an erase — use ``delete_where`` +
    ``compact_store`` when the point is that data must be GONE)."""
    meta = _meta(path)
    _require_no_branches(meta, "drop_column")
    schema = _load_schema(path, meta)
    if name not in schema.fieldNames():
        raise ValueError(f"no column {name!r} in the store schema")
    if len(schema.fields) == 1:
        raise ValueError("cannot drop the store's only column")
    _guard_untouchable(meta, name, "drop")
    if any(name in e["key_cols"] for e in meta.get("eq_deletes") or []):
        raise ValueError(
            f"column {name!r} keys committed equality deletes; compact "
            "the store to materialize them first"
        )
    meta["schema_json"] = StructType(
        [f for f in schema.fields if f.name != name]
    ).jsonValue()
    (meta.get("added_columns") or {}).pop(name, None)
    dropped_aliases = (meta.get("column_renames") or {}).pop(name, [])
    if meta.get("bloom_cols") and name in meta["bloom_cols"]:
        meta["bloom_cols"] = sorted(set(meta["bloom_cols"]) - {name})
    if meta.get("ndv_cols") and name in meta["ndv_cols"]:
        meta["ndv_cols"] = sorted(set(meta["ndv_cols"]) - {name})
    # remember every name whose chunks may still be on disk, so a later
    # add_column of the same name stays refused even though the schema
    # no longer mentions it (chunk presence is checked physically, but
    # the list documents intent for compaction)
    meta.setdefault("retired_columns", []).extend([name] + dropped_aliases)
    _write_meta(path, meta)
