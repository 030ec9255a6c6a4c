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


def _le32_hex(c: Column) -> Column:
    """int col -> 8 hex chars of its 4-byte LITTLE-endian encoding.
    Values outside [0, 2^32) raise (lpad would otherwise silently
    TRUNCATE the high nibbles of a 16-char negative/oversized hex)."""
    h = F.when(
        (c < 0) | (c >= F.lit(1 << 32)),
        F.raise_error(F.concat(
            F.lit("interval field out of u32 range: "),
            c.cast("string"))).cast("string"),
    ).otherwise(F.lpad(F.hex(c), 8, "0"))
    return F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
                    F.substring(h, 3, 2), F.substring(h, 1, 2))


def interval_pack(months: Column, days: Column, millis: Column) -> Column:
    """(months, days, millis) int cols -> the parquet INTERVAL
    fixed(12) layout (LE u32 x 3, reference types/interval.go:82-86) —
    pure JVM expressions, codegen-friendly."""
    return F.unhex(F.concat(_le32_hex(months), _le32_hex(days),
                            _le32_hex(millis)))


def _le32_get(b: Column, byte_off: int) -> Column:
    h = F.hex(F.substring(b, byte_off + 1, 4))
    be = F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
                  F.substring(h, 3, 2), F.substring(h, 1, 2))
    return F.conv(be, 16, 10).cast("long")


def interval_months(col: Column | str) -> Column:
    """INTERVAL fixed(12) binary -> months (types/interval.go:14-16)."""
    c = F.col(col) if isinstance(col, str) else col
    return _le32_get(c, 0)


def interval_days(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _le32_get(c, 4)


def interval_millis(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _le32_get(c, 8)
