"""Roundtrip + statistics operators over arbitrary parquet tables.

These are the engine's public read/write surface exercised as Spark
queries: every Arrow batch of the input is shredded into column chunks,
encoded with the requested (or auto-selected) codec, decoded back, and
returned. The driver's correctness gate compares the output against plain
SQL on the same table — passing means the full encode->decode path is
bit-identical on real data, the distributed analog of the reference's
roundtrip tests (/root/reference/reader/read_test.go:366-391).

`.explain()` shape: a roundtrip is scan -> ArrowEvalPython(mapInArrow) ->
result. No shuffle, no collect; each task handles its own batches, so the
operator scales linearly with input splits.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import chunk


def _roundtrip_batches(
    batches: Iterator[pa.RecordBatch],
    codec_map: dict[str, str],
    compression: str | None,
) -> Iterator[pa.RecordBatch]:
    # Auto-selection runs stats + trial encodes per chunk; at production
    # row-group sizes (16M tokens) that amortizes to noise, but a roundtrip
    # query sees ~10k-row Arrow batches, so re-trialing every batch made
    # codec=auto ~2.4x the forced-codec cost. The distribution is the same
    # column across batches of one task: encode_chunk's pick cache decides
    # on the first batch and reuses the pick per column path — including
    # list/struct sub-paths — with per-chunk safety fallbacks and periodic
    # refresh handled inside the chunk layer.
    pick_cache: dict[str, list] = {}
    for b in batches:
        tbl = pa.Table.from_batches([b])
        arrays = []
        for i, name in enumerate(tbl.column_names):
            col = tbl.column(name).combine_chunks()
            codec = codec_map.get(name, "auto")
            try:
                blob, st = chunk.encode_chunk(
                    col, codec=codec, compression=compression,
                    pick_cache=pick_cache, path=name,
                )
            except ValueError:
                if codec == "auto":
                    raise
                blob, st = chunk.encode_chunk(
                    col, codec="auto", compression=compression
                )
            out = chunk.decode_chunk(blob)
            want = tbl.schema.field(i).type
            if out.type != want:
                # nullability is not part of the value roundtrip: decoded
                # children are nullable; if the source declared them
                # non-null (e.g. VariantType's value/metadata pair), cast
                # to the nullable shape of the same type instead
                try:
                    out = out.cast(want)
                except pa.lib.ArrowTypeError:
                    relaxed = _nullable_shape(want)
                    if out.type != relaxed:
                        out = out.cast(relaxed)
            arrays.append(out)
        yield pa.RecordBatch.from_arrays(arrays, names=tbl.column_names)


def _nullable_shape(t: pa.DataType) -> pa.DataType:
    """The same type with every nested field nullable."""
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _nullable_shape(f.type)) for f in t]
        )
    if pa.types.is_list(t):
        return pa.list_(_nullable_shape(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_nullable_shape(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(_nullable_shape(t.key_type),
                       _nullable_shape(t.item_type))
    return t


def roundtrip_query(
    table: str,
    columns: list[str] | None = None,
    codec_map: dict[str, str] | None = None,
    compression: str | None = "zstd",
):
    """Build a (spark, sf_dir) -> DataFrame callable for the driver contract."""
    cm = codec_map or {}

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if columns:
            df = df.select(*columns)
        schema = df.schema

        def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            return _roundtrip_batches(batches, cm, compression)

        return df.mapInArrow(fn, schema)

    return q


def roundtrip_exploded_query(
    table: str,
    array_col: str,
    codec_map: dict[str, str] | None = None,
    compression: str | None = "zstd",
):
    """Roundtrip a table with a list column, then posexplode the decoded
    array into flat (pos, val) rows so the driver's canonicalizer (which
    cannot hash raw list cells) gets scalar columns. Element-wise equality
    against the plain-SQL oracle is exactly the reference's per-row
    token-array invariant (reader/read_test.go:366-391), checked one
    element at a time instead of one array at a time."""
    inner = roundtrip_query(table, codec_map=codec_map, compression=compression)

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = inner(spark, sf_dir)
        others = [c for c in df.columns if c != array_col]
        return df.select(
            *others, F.posexplode(array_col).alias("pos", "val")
        ).withColumn("val", F.col("val").cast("double"))

    return q


def decimal_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL columns through the codec stack at all three physical
    widths the spec (and the reference, types/decimal.go:12-127) uses:
    precision<=9 -> unscaled INT32, <=18 -> INT64 (full int codec menu,
    auto-selected), >18 -> FLBA16. Output renders the decimals as strings
    so the driver's canonicalizer compares exact digits, not floats."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(8,4)").alias("disc"),
        F.col("l_tax").cast("decimal(3,2)").alias("tax"),
        F.col("l_extendedprice").cast("decimal(25,6)").alias("price_wide"),
    )
    schema = df.schema

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return _roundtrip_batches(batches, {}, "zstd")

    out = df.mapInArrow(fn, schema)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("price").cast("string").alias("price"),
        F.col("disc").cast("string").alias("disc"),
        F.col("tax").cast("string").alias("tax"),
        F.col("price_wide").cast("string").alias("price_wide"),
    )


DECIMAL_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
       CAST(CAST(l_discount AS DECIMAL(8,4)) AS VARCHAR) AS disc,
       CAST(CAST(l_tax AS DECIMAL(3,2)) AS VARCHAR) AS tax,
       CAST(CAST(l_extendedprice AS DECIMAL(25,6)) AS VARCHAR) AS price_wide
FROM lineitem
"""


def flba_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED_LEN_BYTE_ARRAY through the codec stack (reference physical
    type, encodingwrite_plain.go:148-159): md5 digests of p_name as
    fixed_size_binary(16) — encode, decode, compare the hex rendering
    against DuckDB's md5."""
    df = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", F.unhex(F.md5("p_name")).alias("h")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            fsb = tbl.column("h").combine_chunks().cast(pa.binary(16))
            blob, _ = chunk.encode_chunk(fsb, codec="auto", compression="zstd")
            out = chunk.decode_chunk(blob)
            assert out.type == pa.binary(16)
            yield pa.RecordBatch.from_arrays(
                [tbl.column("p_partkey").combine_chunks(),
                 out.cast(pa.binary())],
                names=["p_partkey", "h"],
            )

    out = df.mapInArrow(fn, "p_partkey long, h binary")
    return out.select("p_partkey", F.lower(F.hex("h")).alias("h"))


FLBA_ORACLE = "SELECT p_partkey, md5(p_name) AS h FROM part"


def int96_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT96 legacy-timestamp path (reference physical type,
    encodingwrite_plain.go:89-95): events.ts -> 12-byte INT96 items ->
    FLBA codec stack -> decode -> timestamp, compared as epoch micros."""
    from .. import int96 as i96

    df = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            ts = tbl.column("ts").combine_chunks()
            v96 = i96.timestamps_to_int96(ts)
            blob, _ = chunk.encode_chunk(v96, codec="auto", compression="zstd")
            back = i96.int96_to_timestamps(chunk.decode_chunk(blob))
            yield pa.RecordBatch.from_arrays(
                [tbl.column("event_id").combine_chunks(),
                 back.cast(pa.int64())],
                names=["event_id", "ts_us"],
            )

    return df.mapInArrow(fn, "event_id long, ts_us long")


INT96_ORACLE = (
    "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events"
)


def interval_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL logical type (reference types/interval.go:9-88): three
    LE-uint32 fields (months, days, millis) packed into fixed(12), the
    FLBA codec stack, then the reference's "X mon X day X.xxx sec"
    rendering — built JVM-side from the decoded fields, so the string
    proves the decoded bytes and no Python touches the formatting."""
    from .. import interval as ival

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_orderkey") % F.lit(25)).alias("months"),
        (F.col("o_custkey") % F.lit(31)).alias("days"),
        ((F.col("o_orderkey") * F.lit(7919)) % F.lit(90_061_000)).alias(
            "millis"
        ),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for b in batches:
            tbl = pa.Table.from_batches([b])
            packed = ival.pack_interval(
                *(
                    np.asarray(tbl.column(c).combine_chunks(), dtype=np.int64)
                    for c in ("months", "days", "millis")
                )
            )
            blob, _ = chunk.encode_chunk(packed, codec="auto", compression="zstd")
            m, d, ms = ival.unpack_interval(chunk.decode_chunk(blob))
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("o_orderkey").combine_chunks(),
                    pa.array(m.astype(np.int64)),
                    pa.array(d.astype(np.int64)),
                    pa.array(ms.astype(np.int64)),
                ],
                names=["o_orderkey", "months", "days", "millis"],
            )

    out = df.mapInArrow(fn, "o_orderkey long, months long, days long, millis long")
    # interval.go:22-33: omit zero mon/day parts; emit the sec part when
    # seconds > 0 or every other part was omitted.  concat_ws skips nulls
    # in both engines; %.3f of millis/1000.0 can never sit on a half-way
    # rounding tie (n/1000 is not exactly representable at 0.0005 steps),
    # so Java HALF_UP and fmt round-half-even agree.
    return out.select(
        "o_orderkey",
        "months",
        "days",
        "millis",
        F.concat_ws(
            " ",
            F.when(F.col("months") > 0, F.format_string("%d mon", "months")),
            F.when(F.col("days") > 0, F.format_string("%d day", "days")),
            F.when(
                (F.col("millis") > 0)
                | ((F.col("months") == 0) & (F.col("days") == 0)),
                F.format_string("%.3f sec", F.col("millis") / F.lit(1000.0)),
            ),
        ).alias("ival"),
    )


INTERVAL_ORACLE = """
SELECT o_orderkey, months, days, millis,
       concat_ws(' ',
         CASE WHEN months > 0 THEN printf('%d mon', months) END,
         CASE WHEN days > 0 THEN printf('%d day', days) END,
         CASE WHEN millis > 0 OR (months = 0 AND days = 0)
              THEN printf('%.3f sec', millis / 1000.0) END
       ) AS ival
FROM (SELECT o_orderkey,
             o_orderkey % 25 AS months,
             o_custkey % 31 AS days,
             (o_orderkey * 7919) % 90061000 AS millis
      FROM orders)
"""


def geojson_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY -> GeoJSON logical conversion (reference
    types/geometry.go:11, wkbToGeoJSON types/geospatial_wkb.go:145-188):
    deterministic lon/lat points packed as WKB (vectorized), the codec
    stack, then the GeoJSON text — built JVM-side with format_string
    from the decoded coordinates, so the string proves decode identity
    and no per-row Python touches the rendering.  The full seven-kind
    converter (multi*/collections, byte orders, Z/M) is pinned in
    tests/test_geo.py against hand-built WKB."""
    from .. import geo as geomod

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_orderkey") % 360 - 180 + 0.5).cast("double").alias("x"),
        (F.floor(F.col("o_orderkey") / 7) % 180 - 90 + 0.25)
        .cast("double").alias("y"),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for b in batches:
            tbl = pa.Table.from_batches([b])
            wkb = geomod.wkb_points(
                np.asarray(tbl.column("x").combine_chunks(), dtype=np.float64),
                np.asarray(tbl.column("y").combine_chunks(), dtype=np.float64),
            )
            blob, _ = chunk.encode_chunk(wkb, codec="auto", compression="zstd")
            x, y = geomod.parse_points(chunk.decode_chunk(blob))
            yield pa.RecordBatch.from_arrays(
                [tbl.column("o_orderkey").combine_chunks(),
                 pa.array(x, pa.float64()), pa.array(y, pa.float64())],
                names=["o_orderkey", "x", "y"],
            )

    out = df.mapInArrow(fn, "o_orderkey long, x double, y double")
    # %.6f is exact here (coords are k+0.5 / k+0.25), so Java and DuckDB
    # printf render identically; crs/algorithm are the reference defaults
    return out.select(
        "o_orderkey",
        F.format_string(
            '{"type":"Point","coordinates":[%.6f,%.6f]}', "x", "y"
        ).alias("geojson"),
        F.lit(geomod.DEFAULT_CRS).alias("crs"),
        F.lit(geomod.EDGES_PLANAR).alias("algorithm"),
    )


GEOJSON_ORACLE = """
SELECT o_orderkey,
       printf('{"type":"Point","coordinates":[%.6f,%.6f]}',
              (o_orderkey % 360 - 180 + 0.5),
              ((o_orderkey // 7) % 180 - 90 + 0.25)) AS geojson,
       'OGC:CRS84' AS crs,
       'planar' AS algorithm
FROM orders
"""


def nested_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested schemas through the codec stack: a struct column and a map
    column (Dremel shredding into per-child sub-frames; reference
    marshal/marshal.go:376-414, nested roundtrips read_test.go:366-391).
    The decoded nesting is flattened back to scalars for the oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        "doc_id",
        F.struct("lang", "n_chars").alias("s"),
        F.create_map(F.col("source"), F.col("n_chars")).alias("m"),
    )
    schema = df.schema

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return _roundtrip_batches(batches, {}, "zstd")

    out = df.mapInArrow(fn, schema)
    return out.select(
        "doc_id",
        F.col("s.lang").alias("lang"),
        F.col("s.n_chars").alias("n_chars"),
        F.map_keys("m").getItem(0).alias("mkey"),
        F.map_values("m").getItem(0).alias("mval"),
    )


NESTED_ORACLE = """
SELECT doc_id, lang, n_chars, source AS mkey, n_chars AS mval
FROM documents
"""


def stats_query(table: str, columns: list[str]):
    """Distributed min/max/count statistics computed *by the encode kernel*
    (the analog of page/chunk stats folding, chunk.go:50-122): each task
    encodes its batches and emits per-chunk stats rows; a final groupBy
    folds chunk stats into column stats. Numeric columns only."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(*columns)

        def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for b in batches:
                tbl = pa.Table.from_batches([b])
                names, cnts, nulls, vmins, vmaxs = [], [], [], [], []
                for name in tbl.column_names:
                    col = tbl.column(name).combine_chunks()
                    _, st = chunk.encode_chunk(col, codec="auto", compression=None)
                    names.append(name)
                    cnts.append(st["count"])
                    nulls.append(st["null_count"])
                    vmins.append(float(st.get("min", 0)))
                    vmaxs.append(float(st.get("max", 0)))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(names, pa.utf8()),
                        pa.array(cnts, pa.int64()),
                        pa.array(nulls, pa.int64()),
                        pa.array(vmins, pa.float64()),
                        pa.array(vmaxs, pa.float64()),
                    ],
                    names=["col", "cnt", "nulls", "vmin", "vmax"],
                )

        partial = df.mapInArrow(
            fn, "col string, cnt long, nulls long, vmin double, vmax double"
        )
        return (
            partial.groupBy("col")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("nulls").alias("nulls"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )

    return q


def stats_oracle_sql(table: str, columns: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS col, count({c}) AS cnt, "
        f"count(*) - count({c}) AS nulls, "
        f"CAST(min({c}) AS DOUBLE) AS vmin, CAST(max({c}) AS DOUBLE) AS vmax "
        f"FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(parts)


def uuid_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UUID logical type (reference types/uuid.go:6-31): deterministic
    16-byte ids (md5 of c_name) as FLBA16 through the codec stack, then
    rendered to the canonical 8-4-4-4-12 string with the JVM-side
    converter — no Python in the formatting path."""
    from .. import logical

    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.unhex(F.md5("c_name")).alias("u")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            fsb = tbl.column("u").combine_chunks().cast(pa.binary(16))
            blob, _ = chunk.encode_chunk(fsb, codec="auto", compression="zstd")
            out = chunk.decode_chunk(blob)
            assert out.type == pa.binary(16)
            yield pa.RecordBatch.from_arrays(
                [tbl.column("c_custkey").combine_chunks(),
                 out.cast(pa.binary())],
                names=["c_custkey", "u"],
            )

    out = df.mapInArrow(fn, "c_custkey long, u binary")
    return out.select("c_custkey", logical.uuid_str("u").alias("uuid"))


UUID_ORACLE = r"""
SELECT c_custkey,
       regexp_replace(md5(c_name),
                      '^(.{8})(.{4})(.{4})(.{4})(.{12})$',
                      '\1-\2-\3-\4-\5') AS uuid
FROM customer
"""


def json_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON logical type (reference types/json.go:16-330): render a
    struct to a compact JSON string JVM-side, push the JSON text through
    the codec stack (dict/FSST territory — repeated keys compress), and
    read a field back out with the JSON-path converter. Both directions
    of the reference's converter pair, zero Python expressions."""
    from .. import logical

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        "doc_id", logical.json_of("lang", "n_chars").alias("j")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return _roundtrip_batches(batches, {}, "zstd")

    out = df.mapInArrow(fn, "doc_id long, j string")
    return out.select(
        "doc_id", "j", logical.json_get("j", "$.lang").alias("lang")
    )


JSON_ORACLE = """
SELECT doc_id,
       to_json(struct_pack(lang := lang, n_chars := n_chars))::VARCHAR AS j,
       json_extract_string(
           to_json(struct_pack(lang := lang, n_chars := n_chars)),
           '$.lang') AS lang
FROM documents
"""


def variant_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT logical type (reference types/variant_encode.go — the
    Parquet VARIANT spec's metadata+value binary pair). Spark-first: the
    column is built with Spark's native parse_json (VariantType), crosses
    mapInArrow as struct<value: binary, metadata: binary>, rides the
    struct-shredded codec stack unchanged, and fields are re-extracted
    from the DECODED variant with variant_get — if the binaries were not
    bit-identical, extraction would fail or mismatch."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        "doc_id",
        F.parse_json(
            F.concat(
                F.lit('{"lang": "'), F.col("lang"),
                F.lit('", "n_chars": '),
                F.col("n_chars").cast("string"), F.lit("}"),
            )
        ).alias("v"),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return _roundtrip_batches(batches, {}, "zstd")

    out = df.mapInArrow(fn, df.schema)
    return out.select(
        "doc_id",
        F.variant_get("v", "$.lang", "string").alias("lang"),
        F.variant_get("v", "$.n_chars", "int").alias("n_chars"),
    )


VARIANT_ORACLE = """
SELECT doc_id, lang, n_chars::INTEGER AS n_chars FROM documents
"""


def variant_shredded_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shredded VARIANT (parquet-format VariantShredding.md; reference
    marshal/variant_reconstruct.go + schema.VariantSchemaInfo): ``lang``
    and ``n_chars`` are pulled out of the opaque binary into TYPED
    columns that ride the typed codec menu, a residual ``value`` column
    keeps ``source`` and any type-mismatched field (every doc_id % 7 row
    carries n_chars as a JSON string, so it must stay residual), and the
    read side reconstructs full variants the way the reference's
    Reconstruct does — semantically equal, canonically re-encoded. The
    returned ``was_typed`` column exposes the shred decision itself to
    the oracle."""
    from .. import variant as varmod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nc = F.col("n_chars").cast("string")
    j = F.concat(
        F.lit('{"lang": "'), F.col("lang"),
        F.lit('", "n_chars": '),
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit('"'), nc,
                                                  F.lit('"')))
        .otherwise(nc),
        F.lit(', "source": "'), F.col("source"), F.lit('"}'),
    )
    df = docs.select("doc_id", F.parse_json(j).alias("v"))
    fields = {"lang": "string", "n_chars": "int"}
    typed_arrow = {"lang": pa.utf8(), "n_chars": pa.int64()}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pick_cache: dict[str, list] = {}

        def rt(arr: pa.Array, path: str) -> pa.Array:
            blob, _ = chunk.encode_chunk(arr, codec="auto",
                                         compression="zstd",
                                         pick_cache=pick_cache, path=path)
            return chunk.decode_chunk(blob)

        for b in batches:
            v = b.column("v")
            metas = v.field("metadata").to_pylist()
            vals = v.field("value").to_pylist()
            sh = varmod.shred_rows(metas, vals, fields)
            # every shredded column crosses the codec stack: the typed
            # ones as real typed chunks, metadata/residual as binary
            dec = {
                "metadata": rt(pa.array(sh["metadata"], pa.binary()),
                               "v.metadata").to_pylist(),
                "value": rt(pa.array(sh["value"], pa.binary()),
                            "v.value").to_pylist(),
            }
            typed_dec = {
                f: rt(pa.array(sh[f"typed_{f}"], typed_arrow[f]),
                      f"v.typed.{f}").to_pylist()
                for f in fields
            }
            m2, v2 = varmod.reconstruct_rows(dec["metadata"], dec["value"],
                                             typed_dec)
            out_v = pa.array(
                [{"value": b_v, "metadata": b_m}
                 for b_m, b_v in zip(m2, v2)],
                pa.struct([pa.field("value", pa.binary(), nullable=False),
                           pa.field("metadata", pa.binary(),
                                    nullable=False)]),
            )
            was_typed = pa.array(
                [t is not None for t in sh["typed_n_chars"]], pa.bool_()
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), out_v, was_typed],
                names=["doc_id", "v", "was_typed"],
            )

    from pyspark.sql.types import (
        BooleanType, LongType, StructField, StructType, VariantType,
    )

    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("v", VariantType()),
        StructField("was_typed", BooleanType()),
    ])
    out = df.mapInArrow(fn, out_schema)
    return out.select(
        "doc_id",
        F.variant_get("v", "$.lang", "string").alias("lang"),
        F.variant_get("v", "$.n_chars", "int").alias("n_chars"),
        F.variant_get("v", "$.source", "string").alias("source"),
        "was_typed",
    )


VARIANT_SHREDDED_ORACLE = """
SELECT doc_id, lang, n_chars::INTEGER AS n_chars, source,
       (doc_id % 7 <> 0) AS was_typed
FROM documents
"""


def bson_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BSON logical type (reference types/bson.go:10-35): pack a fixed
    scalar schema into real BSON documents with the vectorized builder,
    push the binary column through the codec stack, decode, and convert
    back to fields with the per-document reader (the reference's
    ConvertBSONLogicalValue analog). Field equality after the roundtrip
    proves both the BSON layout and chunk bit-identity."""
    from .. import bson as bsonmod

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            docs = bsonmod.pack_docs({
                "k": b.column("o_orderkey").to_numpy(zero_copy_only=False)
                .astype("int64"),
                "st": b.column("o_orderstatus").to_pylist(),
                "tp": b.column("o_totalprice").to_numpy(zero_copy_only=False)
                .astype("float64"),
            })
            blob, _ = chunk.encode_chunk(docs, codec="auto",
                                         compression="zstd")
            out = chunk.decode_chunk(blob)
            maps = bsonmod.unpack_docs(out)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([m["k"] for m in maps], pa.int64()),
                    pa.array([m["st"] for m in maps], pa.utf8()),
                    pa.array([m["tp"] for m in maps], pa.float64()),
                ],
                names=["o_orderkey", "o_orderstatus", "o_totalprice"],
            )

    return df.mapInArrow(
        fn, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )


BSON_ORACLE = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"


def typed_ext_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended physical/logical types through the codec stack: int8/16,
    uint32/uint64 (reference INT_8/16 + UINT converted types,
    common/functable.go:38-41) and ms-timestamps / us-time-of-day /
    ms-durations (types/timestamp.go, types/time.go). Typed arrays are
    derived deterministically from o_orderkey, encoded, decoded, type-
    checked in-kernel, and rendered to oracle-comparable scalars."""
    import numpy as np
    import pyarrow.compute as pc

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pick_cache: dict[str, list] = {}
        for b in batches:
            key = np.asarray(
                pa.Table.from_batches([b]).column("o_orderkey").combine_chunks()
            ).astype(np.int64)
            uk = key.view(np.uint64)
            typed = {
                "i8": pa.array((key % 256 - 128).astype(np.int8)),
                "i16": pa.array((key % 65536 - 32768).astype(np.int16)),
                "u32": pa.array(
                    ((uk * np.uint64(2654435761)) % np.uint64(2**32)).astype(
                        np.uint32
                    )
                ),
                "u64": pa.array(
                    uk * np.uint64(11400714819323198485)
                    + np.uint64(2246822507)
                ),
                "ts_ms": pa.array(key * 77_777, type=pa.int64()).view(
                    pa.timestamp("ms")
                ),
                "t64": pa.array(
                    (key * 1_000_003) % 86_400_000_000, type=pa.int64()
                ).view(pa.time64("us")),
                "dur": pa.array(key - 5000, type=pa.int64()).view(
                    pa.duration("ms")
                ),
            }
            decoded = {}
            for name, arr in typed.items():
                blob, _ = chunk.encode_chunk(
                    arr, codec="auto", compression="zstd",
                    pick_cache=pick_cache, path=name,
                )
                out = chunk.decode_chunk(blob)
                if out.type != arr.type or not out.equals(arr):
                    raise ValueError(f"typed roundtrip mismatch on {name}")
                decoded[name] = out
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(key),
                    pc.cast(decoded["i8"], pa.int32()),
                    pc.cast(decoded["i16"], pa.int32()),
                    pc.cast(decoded["u32"], pa.int64()),
                    pc.cast(decoded["u64"], pa.string()),
                    pc.cast(decoded["ts_ms"].view(pa.int64()), pa.int64()),
                    pc.cast(decoded["t64"].view(pa.int64()), pa.int64()),
                    pc.cast(decoded["dur"].view(pa.int64()), pa.int64()),
                ],
                names=["o_orderkey", "i8", "i16", "u32", "u64_str",
                       "ts_ms_epoch", "t64_us", "dur_ms"],
            )

    return df.mapInArrow(
        fn,
        "o_orderkey long, i8 int, i16 int, u32 long, u64_str string, "
        "ts_ms_epoch long, t64_us long, dur_ms long",
    )


TYPED_EXT_ORACLE = """
SELECT
  o_orderkey,
  CAST(o_orderkey % 256 - 128 AS INT) AS i8,
  CAST(o_orderkey % 65536 - 32768 AS INT) AS i16,
  CAST((CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)
    AS u32,
  CAST((CAST(o_orderkey AS HUGEINT) * 11400714819323198485 + 2246822507)
       % 18446744073709551616 AS VARCHAR) AS u64_str,
  o_orderkey * 77777 AS ts_ms_epoch,
  (o_orderkey * 1000003) % 86400000000 AS t64_us,
  o_orderkey - 5000 AS dur_ms
FROM orders
"""


def struct_project_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial subtree read (reference ReadPartial,
    reader/reader.go:347-410): a 3-field struct (one nested) is encoded
    whole, then ONLY the requested subtrees are decoded via
    decode_chunk_partial — the big text sibling's decode kernel never
    runs (pinned by pytest; here the values prove correctness)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        "doc_id",
        F.struct(
            F.col("lang"),
            F.struct(F.col("n_chars"), F.col("source")).alias("meta"),
            F.col("text"),
        ).alias("s"),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pick_cache: dict[str, list] = {}
        for b in batches:
            tbl = pa.Table.from_batches([b])
            s = tbl.column("s").combine_chunks()
            blob, _ = chunk.encode_chunk(
                s, codec="auto", compression="zstd",
                pick_cache=pick_cache, path="s",
            )
            lang = chunk.decode_chunk_partial(blob, "lang")
            n_chars = chunk.decode_chunk_partial(blob, "meta.n_chars")
            yield pa.RecordBatch.from_arrays(
                [tbl.column("doc_id").combine_chunks(), lang, n_chars],
                names=["doc_id", "lang", "n_chars"],
            )

    return df.mapInArrow(fn, "doc_id long, lang string, n_chars long")


STRUCT_PROJECT_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
"""
