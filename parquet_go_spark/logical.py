"""Logical-type conversion surface (reference ``types/`` package analogs).

The reference ships per-value converters for UUID (types/uuid.go:6-31),
JSON (types/json.go:16-330), and friends, applied row-at-a-time in its
marshal layer. Spark-first, these are column *expressions* — pure JVM
built-ins inside whole-stage codegen, no Python in the hot path — over
the same physical representations the chunk codecs already roundtrip
(UUID = FLBA16, JSON = annotated string).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UUID_RE = r"^(.{8})(.{4})(.{4})(.{4})(.{12})$"


def uuid_str(col: Column | str) -> Column:
    """binary(16) -> canonical 8-4-4-4-12 lowercase UUID string — the
    reference's ConvertUUIDValue (types/uuid.go:6-31) as one JVM regexp
    over the hex rendering."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.hex(c)), _UUID_RE,
                            "$1-$2-$3-$4-$5")


def uuid_bytes(col: Column | str) -> Column:
    """Canonical UUID string -> binary(16) (the write-side inverse the
    reference applies when marshalling string UUIDs into FLBA16)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.translate(c, "-", ""))


def json_of(*cols: Column | str) -> Column:
    """Named columns -> one compact JSON object string (the reference's
    parquetTypeToJSONType direction, types/json.go:42-150) — Spark's
    to_json over a struct, key order = argument order."""
    named = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.to_json(F.struct(*named))


def json_get(col: Column | str, path: str) -> Column:
    """JSON string -> one field as a string (JSONTypeToParquetType
    direction, types/json.go:155-199); path is a $.dotted JSONPath."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
