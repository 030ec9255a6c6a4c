"""Row-level deletes on a PGS store: merge-on-read positional tombstones.

The capability the reference cannot have (a parquet-go file is written
once and immutable) but a 100 TB training-data store cannot live without:
PII takedowns, contaminated-document removal, and opt-outs must not
rewrite the store. This is the Iceberg positional-delete-file model over
our blob layout:

  * ``delete_where`` runs ONE distributed job: read the store through the
    native source with its virtual row-address columns
    (``with_pos`` -> ``_pgs_part``/``_pgs_pos``), filter by the
    condition (pushFilters prunes partitions/pages from manifest stats
    before any task launches), and write the matching addresses as
    parquet tombstone files under ``<store>/deletes/del-<token>/``.
    Row data never crosses to the driver — only the commit metadata does.
  * The commit point is the store-meta write (same protocol as the batch
    writer's generations): a tombstone dir not listed in meta
    ``deletes`` is invisible, so a crash mid-delete leaves the store
    exactly as it was. ``sweep_store`` collects such orphans.
  * Every read path applies committed tombstones (pgs_datasource read():
    tasks fetch only their own partition's positions via parquet
    row-group pruning on ``part_id``, then drop rows with one vectorized
    mask). Deletes are retroactive across ``as_of_batch``/``as_of_commit``
    snapshots by design — takedown semantics, the opposite of Iceberg's
    frozen snapshots, because the point is that the data is GONE.
  * ``compact_store`` materializes tombstones: affected partitions are
    forced through the re-encode arm with deleted rows dropped, and the
    destination store carries no ``deletes`` metadata.

At 100 TB: the delete scan is an ordinary pruned read (stats/blooms/pages
cut it to the partitions that can match); tombstone files are written by
executors and only their (lo, hi, rows) summary is read driver-side from
parquet footers; read-side application is per-task and proportional to
the partition's own tombstones.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.pgs_datasource import (
    _hist_state, _meta, _require_no_branches, _write_meta, register,
)


def _snapshot_now(meta: dict) -> int:
    """The append-commit snapshot that is current under this meta — the
    changelog tag for a delete committed now (``changes.read_changes``
    emits the entry to windows crossing it). 0 on stores without
    append-commit history (operator-written / stream stores, where the
    changelog is refused anyway)."""
    hist, base, _ = _hist_state(meta)
    return base + len(hist)


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    read_options: dict | None = None,
) -> dict:
    """Tombstone every live row of the store matching ``condition``
    (a Spark SQL boolean expression over the store's columns; the
    virtual ``_pgs_part``/``_pgs_pos`` are also addressable). Returns
    ``{"deleted_rows": n, "name": tombstone-dir or None}``.

    Already-deleted rows are invisible to the scan (the read applies
    existing tombstones), so re-running the same delete is a no-op.
    Single-writer, like the store writers themselves.
    """
    register(spark)
    _require_no_branches(_meta(path), "delete_where")
    df = _read_with_pos(spark, path, read_options)
    hits = df.filter(condition)
    return _commit_tombstones(path, hits)


def delete_matching(
    spark: SparkSession,
    path: str,
    keys,
    key_cols: list[str] | str,
    read_options: dict | None = None,
) -> dict:
    """Tombstone every live row whose key matches a row of ``keys`` (a
    DataFrame carrying ``key_cols``). The match is a distributed
    semi-join — no key list ever crosses to the driver, so a
    billion-row takedown list is fine (AQE broadcasts it when small)."""
    register(spark)
    _require_no_branches(_meta(path), "delete_matching")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    df = _read_with_pos(spark, path, read_options)
    keys = keys.select(*key_cols).distinct()
    # key-range pre-prune: rows outside the batch's [min, max] on each
    # key column cannot match the semi-join, and a range predicate DOES
    # push down (stats/blooms/pages prune partitions before any decode)
    # while a join never does. One tiny agg on the key batch buys a
    # pruned store scan — the difference between "touch 3 partitions"
    # and "scan 100 TB" for a small upsert.
    bounds = keys.agg(*(
        f(c).alias(f"{f.__name__}_{c}")
        for c in key_cols for f in (F.min, F.max)
    )).collect()[0]
    for c in key_cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is not None and hi is not None:
            df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    hits = df.join(keys, on=key_cols, how="left_semi")
    return _commit_tombstones(path, hits)


def delete_values(
    spark: SparkSession,
    path: str,
    keys,
    key_cols: list[str] | str,
) -> dict:
    """Equality delete (Iceberg's second delete flavor): commit the key
    VALUES themselves — ``keys`` is a DataFrame carrying ``key_cols`` —
    and let every reader drop matching rows. Unlike ``delete_matching``
    this runs NO store scan at all: the only job is writing the
    distinct keys as parquet under ``deletes/eq-<token>/``, so a
    takedown of a million keys over a 100 TB store is O(keys).

    Scope is the store AS OF the delete: the entry records ``cap`` (one
    past the highest committed part id; appended part ids are strictly
    increasing), and readers apply the entry only to partitions below
    it — a row with the same key appended LATER survives, which is what
    makes the lazy upsert correct. Matching is null-safe (null key
    matches null rows) and exact; float/double/nested key columns are
    refused (see ``eqdel.py``). Returns ``{"keys": n, "name": ...,
    "cap": ...}``.
    """
    import pyarrow.dataset as pads

    from .. import eqdel
    from ..sources.pgs_datasource import (
        PGSStreamWriter, _committed_files,
    )

    register(spark)
    _require_no_branches(_meta(path), "delete_values")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    store_schema = spark.read.format("pgs").load(path).schema
    meta = _meta(path)
    for c in key_cols:
        if c.startswith("_pgs_") or c == "part_id":
            raise ValueError(
                f"virtual/reserved column {c!r} cannot key an equality "
                "delete (use delete_where for address-based deletes)"
            )
        if c in (meta.get("shredded") or {}):
            raise ValueError(
                f"shredded variant column {c!r} cannot key an equality "
                "delete; delete by a typed field instead"
            )
        if c not in store_schema.fieldNames():
            raise ValueError(f"no column {c!r} in the store schema")
        eqdel.check_key_field(store_schema[c])

    # cap = one past the highest COMMITTED part id right now (stream
    # stores additionally cap at the batch watermark) — metadata-scale:
    # one manifest row per chunk, no blob bytes
    files = _committed_files(path)
    cap = 0
    if files:
        t = pads.dataset(files, format="parquet").to_table(
            columns=["part_id"]
        )
        pids = t.column("part_id").to_numpy()
        if meta.get("clustering") == "stream_append":
            wm = (
                meta.get("last_committed_batch", -1) + 1
            ) * PGSStreamWriter.STRIDE
            pids = pids[pids < wm]
        if len(pids):
            cap = int(pids.max()) + 1
    if cap == 0:
        return {"keys": 0, "name": None, "cap": 0}

    token = uuid.uuid4().hex[:12]
    ddir = os.path.join(path, "deletes")
    tmp = os.path.join(ddir, f"_tmp-{token}")
    # optimistic concurrency: the part-id cap computed above is only
    # exact against THIS meta state (a concurrent rollback/compaction
    # would re-scope the entry); refuse the commit if it moved
    from ..sources.pgs_datasource import (
        _check_commit_token, _meta_fingerprint,
    )

    fp = _meta_fingerprint(path)
    # executor-written key files; only the row count reaches the driver
    keys.select(*key_cols).distinct().write.mode("overwrite").parquet(tmp)
    n_keys = sum(
        f.metadata.num_rows
        for f in pads.dataset(tmp, format="parquet").get_fragments()
    )
    if n_keys == 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return {"keys": 0, "name": None, "cap": cap}
    name = f"eq-{token}"
    _check_commit_token(path, fp, "delete_values")
    os.replace(tmp, os.path.join(ddir, name))
    # integer key bounds from the key files' parquet footers: readers
    # skip the anti-join entirely for partitions whose manifest stats
    # cannot intersect (advisory-lossless — a partition with unknown
    # stats just pays the join). Strings are skipped: footer stats may
    # be writer-truncated, and exactness here is non-negotiable.
    bounds = _int_key_bounds(os.path.join(ddir, name), key_cols)
    meta = _meta(path)
    meta.setdefault("eq_deletes", []).append({
        "name": name,
        # changelog tag: equality deletes are key predicates, not row
        # addresses, so read_changes refuses windows crossing this
        # snapshot (compact_store materializes them away)
        "at": _snapshot_now(meta),
        # logical names (maintained by rename_column) vs the physical
        # parquet column names inside the key files (fixed forever)
        "key_cols": list(key_cols),
        "file_cols": list(key_cols),
        "keys": n_keys,
        "cap": cap,
        "bounds": bounds,
    })
    _write_meta(path, meta)  # THE commit point
    return {"keys": n_keys, "name": name, "cap": cap}


def upsert_by_key(
    spark: SparkSession,
    path: str,
    df,
    key_cols: list[str] | str,
    read_options: dict | None = None,
    write_options: dict | None = None,
    lazy: bool = False,
) -> dict:
    """MERGE by key: rows of ``df`` replace the store's rows with the
    same key, the rest insert — tombstone-matching + append, the
    Iceberg merge-on-read upsert shape. NOT a single atomic commit: a
    crash between the two leaves the deletes applied and the append
    absent (re-running the upsert converges). Single-writer, like every
    store mutation.

    ``lazy=True`` switches the delete arm to ``delete_values``
    (equality deletes): the store is never scanned — the whole upsert
    is one key-file write plus the append, with matching deferred to
    readers. The appended rows survive their own delete because the
    entry's part-id cap predates them."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    # the append must match the store's recorded layout; inherit the
    # non-secret knobs so an upsert on a bloomed/paged/sorted store
    # works without re-declaring them (keys stay caller-supplied)
    meta = _meta(path)
    _require_no_branches(meta, "upsert_by_key")
    wo = _inherit_layout(meta, write_options)
    # PRE-FLIGHT the append before tombstoning anything: constructing
    # the writer runs every schema/layout/stream-store check without
    # writing a byte. Without this, a mismatched batch would commit the
    # deletes durably and then fail the append on every retry — the
    # matched rows would be gone, not replaced.
    from ..sources.pgs_datasource import PGSArrowWriter

    PGSArrowWriter(path, df.schema, False, wo)
    df = df.persist()  # scanned by bounds + semi-join/keys + append
    try:
        if lazy:
            deleted = delete_values(spark, path, df, key_cols)
        else:
            deleted = delete_matching(
                spark, path, df, key_cols, read_options
            )
        w = df.write.format("pgs").mode("append")
        for k, v in wo.items():
            w = w.option(k, v)
        w.save(path)
    finally:
        df.unpersist()
    if lazy:
        return {"deleted_keys": deleted["keys"]}
    return {"deleted_rows": deleted["deleted_rows"]}


def update_where(
    spark: SparkSession,
    path: str,
    condition: str,
    set_exprs: dict[str, str],
    read_options: dict | None = None,
    write_options: dict | None = None,
) -> dict:
    """UPDATE ... SET over the store (the remaining DML verb next to
    delete_where and upsert_by_key): rows matching ``condition`` get
    each ``set_exprs`` column replaced by its SQL expression (evaluated
    over the OLD row, so ``{"n_chars": "n_chars + 1"}`` works), as
    tombstone-old + append-new — merge-on-read, no partition rewrite.

    Like the upsert this is two commits, not one, but with a
    compensator: the matched rows are materialized (localCheckpoint)
    BEFORE the tombstone commit, the append is pre-flighted before
    anything is deleted, and if the append still fails the tombstone
    entry is rolled back (positions stay live, so removing the meta
    entry restores the exact prior store). The remaining window is a
    process crash between the two meta writes; the returned tombstone
    ``name`` is what an operator would roll back by hand."""
    from ..sources.pgs_datasource import PGSArrowWriter

    register(spark)
    _require_no_branches(_meta(path), "update_where")
    store_schema = spark.read.format("pgs").load(path).schema
    meta = _meta(path)
    for c in set_exprs:
        if c not in store_schema.fieldNames():
            raise ValueError(f"no column {c!r} in the store schema")
        if c in (meta.get("shredded") or {}):
            raise ValueError(
                f"cannot update shredded variant column {c!r}"
            )
    wo = _inherit_layout(meta, write_options)
    # pre-flight the append (schema/layout/stream checks) before any
    # mutation — a refused append must leave the store untouched
    PGSArrowWriter(path, store_schema, False, wo)

    df = _read_with_pos(spark, path, read_options)
    # materialize matches (addresses AND old values) before the
    # tombstone commit: the updated rows derive FROM the store, so a
    # lazy recompute after the delete would see them already gone
    hits = df.filter(condition).localCheckpoint()
    n = hits.count()
    if n == 0:
        return {"updated_rows": 0, "name": None}
    updated = hits.select(*[
        F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
        if f.name in set_exprs else F.col(f.name)
        for f in store_schema.fields
    ])
    res = _commit_tombstones(path, hits)
    try:
        _append(updated, path, wo)
    except BaseException:
        # compensate: the tombstoned positions still hold their bytes,
        # so dropping the meta entry restores the exact prior store
        # (the orphaned dir is sweep_store food)
        m = _meta(path)
        m["deletes"] = [
            e for e in m.get("deletes") or [] if e["name"] != res["name"]
        ]
        _write_meta(path, m)
        raise
    return {"updated_rows": n, "name": res["name"]}


def merge_into(
    spark: SparkSession,
    path: str,
    source,
    on: list[str] | str,
    when_matched: dict[str, str] | str | None = None,
    matched_condition: str | None = None,
    when_not_matched: dict[str, str] | bool = False,
    not_matched_condition: str | None = None,
    read_options: dict | None = None,
    write_options: dict | None = None,
) -> dict:
    """Conditional MERGE INTO (the Iceberg/ANSI verb the simple
    ``upsert_by_key`` is a special case of): join ``source`` to the
    store on the ``on`` key columns, then

      * ``when_matched``: ``"delete"`` removes matched store rows, or a
        ``{col: sql_expr}`` dict rewrites them — expressions see BOTH
        sides as ``t.col`` (the store's old values) and ``s.col`` (the
        source row), so ``{"qty": "t.qty + s.qty"}`` accumulates.
        ``matched_condition`` (over ``t``/``s``) narrows which matched
        rows the action touches; the rest stay as they are.
      * ``when_not_matched``: ``True`` inserts unmatched source rows
        verbatim (source must carry the store schema), or a
        ``{col: sql_expr}`` dict over ``s`` builds them;
        ``not_matched_condition`` narrows which source rows insert.

    Matching is ANSI ``=`` on the keys (null keys never match, same as
    SQL MERGE ON). A source with duplicate keys that HIT the store is
    refused (one target row must not merge twice — the ANSI ambiguity
    rule); duplicates confined to the insert arm are allowed.

    Execution is tombstone-matched + one append (merge-on-read, no
    partition rewrite), with ``update_where``'s crash discipline: both
    arms are materialized (localCheckpoint) BEFORE the tombstone commit
    — the insert anti-join derives from the store, so computing it
    lazily after the delete would re-insert rows the matched arm just
    removed — the append is pre-flighted before any mutation, and a
    failed append rolls the tombstone entry back (exact restore).

    At 100 TB: the matched arm is one equi-join against a store scan
    pre-pruned by the source's key range (same lever as
    ``delete_matching``); the insert arm is a left-anti join on the
    same keys; AQE broadcasts small sources on both.
    """
    from ..sources.pgs_datasource import PGSArrowWriter

    register(spark)
    _require_no_branches(_meta(path), "merge_into")
    if isinstance(on, str):
        on = [on]
    if when_matched is None and not when_not_matched:
        raise ValueError(
            "merge_into needs at least one action: when_matched "
            "and/or when_not_matched"
        )
    if isinstance(when_matched, str) and when_matched != "delete":
        raise ValueError(
            "when_matched must be 'delete', a {col: expr} dict, or None"
        )
    store_schema = spark.read.format("pgs").load(path).schema
    meta = _meta(path)
    store_cols = store_schema.fieldNames()
    for c in on:
        if c.startswith("_pgs_") or c == "part_id":
            raise ValueError(f"virtual/reserved column {c!r} cannot key "
                             "a merge")
        if c not in store_cols:
            raise ValueError(f"no column {c!r} in the store schema")
        if c not in source.columns:
            raise ValueError(f"no column {c!r} in the source")
    upd = when_matched if isinstance(when_matched, dict) else {}
    if isinstance(when_matched, dict) and not upd:
        # {} would tombstone matches and append nothing — a silent
        # DELETE the caller did not ask for
        raise ValueError(
            "when_matched={} updates no columns; pass assignments, "
            "'delete', or None"
        )
    for c in upd:
        if c not in store_cols:
            raise ValueError(f"no column {c!r} in the store schema")
        if c in (meta.get("shredded") or {}):
            raise ValueError(
                f"cannot update shredded variant column {c!r}"
            )
    wo = _inherit_layout(meta, write_options)
    # pre-flight the append (schema/layout/stream checks) before any
    # mutation — a refused merge must leave the store untouched
    PGSArrowWriter(path, store_schema, False, wo)

    source = source.persist()  # ambiguity check + both join arms
    try:
        # key-range pre-prune, same lever as delete_matching: a range
        # predicate pushes into stats/bloom/page pruning, a join never
        # does
        bounds = source.agg(*(
            f(c).alias(f"{f.__name__}_{c}")
            for c in on for f in (F.min, F.max)
        )).collect()[0]

        def _pruned_target():
            # ONE load per executed arm: the pushdown reader's scan
            # plan is cached on the loaded relation (the pinned engine
            # hazard), so the matched arm and the insert arm must each
            # execute a FRESH single-use load — sharing one would let
            # the second execution replay the first's pruned partition
            # list (e.g. a pushed t-side matched_condition) and
            # misclassify its rows
            df = _read_with_pos(spark, path, read_options)
            for c in on:
                lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
                if lo is not None and hi is not None:
                    df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
            return df

        t, s = _pruned_target().alias("t"), source.alias("s")
        cond = None
        for c in on:
            eq = F.col(f"t.{c}") == F.col(f"s.{c}")
            cond = eq if cond is None else (cond & eq)
        act = t.join(s, cond, "inner")
        if matched_condition is not None:
            act = act.filter(matched_condition)
        n_matched = 0
        hits = updated = None
        if when_matched is not None:
            # project addresses (+ the rewritten row, if updating) while
            # the t/s qualifiers still resolve, THEN materialize —
            # localCheckpoint cuts lineage and with it the join aliases,
            # and the matched rows derive from the store so they must be
            # real before the tombstone commit
            proj = [
                F.col("t._pgs_part").alias("_pgs_part"),
                F.col("t._pgs_pos").alias("_pgs_pos"),
            ]
            if upd:
                proj += [
                    F.expr(upd[f.name]).cast(f.dataType).alias(f.name)
                    if f.name in upd else
                    F.col(f"t.{f.name}").alias(f.name)
                    for f in store_schema.fields
                ]
            act = act.select(*proj).localCheckpoint()
            n_matched = act.count()
            # ANSI ambiguity rule: one target row merged by two source
            # rows is an error, not a nondeterministic pick
            if n_matched and act.groupBy("_pgs_part", "_pgs_pos") \
                    .count().filter("count > 1").limit(1).count():
                raise ValueError(
                    "source has duplicate keys matching the same store "
                    "row; deduplicate the source or tighten "
                    "matched_condition"
                )
            hits = act.select("_pgs_part", "_pgs_pos")
            if upd:
                updated = act.drop("_pgs_part", "_pgs_pos")
        inserts = None
        n_inserted = 0
        if when_not_matched:
            # the pruned target is sufficient here too (the prune bounds
            # come FROM the source keys, so no source row can match a
            # target row outside them) — but through a FRESH load, never
            # the matched arm's (see _pruned_target)
            ins = source.alias("s").join(
                _pruned_target().alias("t2"),
                [F.col(f"s.{c}") == F.col(f"t2.{c}") for c in on],
                "left_anti",
            )
            if not_matched_condition is not None:
                ins = ins.filter(not_matched_condition)
            if isinstance(when_not_matched, dict):
                missing = [f.name for f in store_schema.fields
                           if f.name not in when_not_matched]
                if missing:
                    raise ValueError(
                        f"when_not_matched leaves columns {missing} "
                        "unset; give every store column an expression"
                    )
                ins = ins.select(*[
                    F.expr(when_not_matched[f.name])
                    .cast(f.dataType).alias(f.name)
                    for f in store_schema.fields
                ])
            else:
                missing = [c for c in store_cols
                           if c not in source.columns]
                if missing:
                    raise ValueError(
                        f"source lacks store columns {missing}; pass a "
                        "when_not_matched projection dict instead"
                    )
                ins = ins.select(*[
                    F.col(f"s.{f.name}").cast(f.dataType).alias(f.name)
                    for f in store_schema.fields
                ])
            # the anti-join derives from the store: materialize before
            # the tombstone commit or deleted matches would re-insert
            inserts = ins.localCheckpoint()
            n_inserted = inserts.count()

        appended = None
        if updated is not None and inserts is not None:
            appended = updated.unionAll(inserts)
        else:
            appended = updated if updated is not None else inserts

        if n_matched == 0 and n_inserted == 0:
            return {"matched_rows": 0, "inserted_rows": 0, "name": None}
        res = {"deleted_rows": 0, "name": None}
        if when_matched is not None and n_matched:
            res = _commit_tombstones(path, hits)
        if appended is not None and (n_matched if upd else 0) + n_inserted:
            try:
                _append(appended, path, wo)
            except BaseException:
                if res["name"] is not None:
                    # compensate exactly like update_where: positions
                    # still hold bytes, dropping the entry restores them
                    m = _meta(path)
                    m["deletes"] = [
                        e for e in m.get("deletes") or []
                        if e["name"] != res["name"]
                    ]
                    _write_meta(path, m)
                raise
        return {"matched_rows": n_matched, "inserted_rows": n_inserted,
                "name": res["name"]}
    finally:
        source.unpersist()


def _int_key_bounds(d: str, key_cols: list[str]) -> dict:
    """{logical key position -> [lo, hi]} for integer-typed key columns,
    from the key files' parquet footers only. A column any of whose
    row groups lacks exact stats is omitted (cannot prune on it)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    files = [
        os.path.join(d, f) for f in sorted(os.listdir(d))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    ds = pads.dataset(files, format="parquet")
    int_cols = {
        f.name for f in ds.schema
        if pa.types.is_integer(f.type)
    } & set(key_cols)
    out: dict[str, list[int]] = {}
    for frag in ds.get_fragments():
        md = frag.metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                nm = c.path_in_schema
                if nm not in int_cols:
                    continue
                st = c.statistics
                # a NULL key matches null rows, which value stats say
                # nothing about — a column with any null key must not
                # carry bounds at all
                if st is None or not st.has_min_max \
                        or st.null_count is None or st.null_count > 0:
                    int_cols.discard(nm)
                    out.pop(nm, None)
                    continue
                lo, hi = int(st.min), int(st.max)
                if nm in out:
                    out[nm] = [min(out[nm][0], lo), max(out[nm][1], hi)]
                else:
                    out[nm] = [lo, hi]
    # keyed by position so rename_column need not rewrite it
    return {
        str(key_cols.index(nm)): b for nm, b in out.items()
        if nm in int_cols
    }


def _inherit_layout(meta: dict, write_options: dict | None) -> dict:
    """Append-arm write options inherited from the store's recorded
    layout (an upsert/update on a bloomed/paged/sorted/shredded store
    must not re-declare it — and the layout guard would refuse a
    mismatch anyway). Keys stay caller-supplied."""
    wo = dict(write_options or {})
    if meta.get("bloom_cols") and "bloom_cols" not in wo:
        wo["bloom_cols"] = ",".join(meta["bloom_cols"])
    if meta.get("ndv_cols") and "ndv_cols" not in wo:
        wo["ndv_cols"] = ",".join(meta["ndv_cols"])
    if meta.get("page_rows") and "page_rows" not in wo:
        wo["page_rows"] = str(meta["page_rows"])
    if meta.get("key_col") and "sort_key" not in wo:
        wo["sort_key"] = meta["key_col"]
    if meta.get("shredded") and "shred_variant" not in wo:
        wo["shred_variant"] = ";".join(
            f"{col}:" + ",".join(
                f"{f}={k}" for f, k in sorted(fields.items())
            )
            for col, fields in sorted(meta["shredded"].items())
        )
    return wo


def _append(df, path: str, write_options: dict) -> None:
    w = df.write.format("pgs").mode("append")
    for k, v in write_options.items():
        w = w.option(k, v)
    w.save(path)


def compact_tombstones(spark: SparkSession, path: str) -> dict:
    """Merge every committed tombstone dir into one (the Iceberg
    rewrite_position_delete_files maintenance action): a store that has
    taken N delete operations makes readers open N dirs per partition;
    after this, one. Range-partitioned on part_id so each reader task's
    pushdown touches one file. The meta replace is the commit point;
    the superseded dirs become invisible there and are removed (any
    crash leftover is ``sweep_store`` food)."""
    from ..sources.pgs_datasource import _delete_files

    meta = _meta(path)
    _require_no_branches(meta, "compact_tombstones")
    entries = meta.get("deletes") or []
    if len(entries) <= 1:
        return {"merged_dirs": 0, "deleted_rows": sum(
            e.get("rows", 0) for e in entries)}
    files = _delete_files(path, [e["name"] for e in entries])
    df = (
        spark.read.parquet(*files)
        .select("part_id", "pos")
        .distinct()  # overlapping deletes tombstone the same address
        .repartitionByRange(max(1, len(files) // 8), "part_id")
        .sortWithinPartitions("part_id", "pos")
    )
    token = uuid.uuid4().hex[:12]
    ddir = os.path.join(path, "deletes")
    tmp = os.path.join(ddir, f"_tmp-{token}")
    df.write.mode("overwrite").parquet(tmp)
    lo, hi, rows = _tombstone_summary(tmp)
    name = f"del-{token}"
    os.replace(tmp, os.path.join(ddir, name))
    meta = _meta(path)
    ents = meta.get("deletes") or []
    old = [e["name"] for e in ents]
    merged = {"name": name, "lo": lo, "hi": hi, "rows": rows}
    ats = [e.get("at") for e in ents]
    if ats and None not in ats:
        # the merged entry inherits the LATEST tag: a changelog window
        # reaching max(at) re-emits every merged address — re-deleting an
        # address the consumer already applied (or whose row its sync
        # never saw: tombstones apply at sync time) is a no-op, whereas
        # min(at) could hide a later delete from the window that owes it.
        # Windows ending before max(at) see those events once their
        # cursor passes it (deferred, never lost).
        merged["at"] = max(ats)
    seqs = [e.get("seq") for e in ents]
    if seqs and None not in seqs:
        # same rule on the change-feed counter: a cursor past max(seq)
        # consumed every merged entry (never re-emitted); a cursor
        # before it re-receives the merged addresses (idempotent)
        merged["seq"] = max(seqs)
    meta["deletes"] = [merged]
    _write_meta(path, meta)  # THE commit point
    # the superseded dirs became invisible at the meta write; leave them
    # for sweep_store so a reader that planned against the OLD meta can
    # still finish its tasks ("readers are safe at any instant")
    return {"merged_dirs": len(old), "deleted_rows": rows,
            "superseded": old}


def _read_with_pos(spark: SparkSession, path: str,
                   read_options: dict | None):
    # single-use load per delete (fresh relation), so the pruning reader
    # is safe to opt into — a takedown scan should prune
    reader = (
        spark.read.format("pgs")
        .option("with_pos", "true").option("pushdown", "true")
    )
    for k, v in (read_options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def _commit_tombstones(path: str, hits) -> dict:
    """One Spark job writes the matching row addresses as tombstone
    parquet; the store-meta write is the commit point. Optimistic
    concurrency: the positions are computed against the state captured
    here — a concurrent compaction/rollback would rebase or retire the
    part ids they address, so a meta change during the scan refuses the
    commit (single-writer violation detected, not silently applied)."""
    from ..sources.pgs_datasource import (
        _check_commit_token, _meta_fingerprint,
    )

    fp = _meta_fingerprint(path)
    hits = hits.select(
        F.col("_pgs_part").alias("part_id"),
        F.col("_pgs_pos").alias("pos"),
    )
    token = uuid.uuid4().hex[:12]
    ddir = os.path.join(path, "deletes")
    tmp = os.path.join(ddir, f"_tmp-{token}")
    # executor-written tombstones; nothing but metadata reaches the driver
    hits.write.mode("overwrite").parquet(tmp)
    lo, hi, rows = _tombstone_summary(tmp)
    if rows == 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return {"deleted_rows": 0, "name": None}
    name = f"del-{token}"
    _check_commit_token(path, fp, "delete")  # dir not yet committed
    os.replace(tmp, os.path.join(ddir, name))
    meta = _meta(path)
    # "at": the snapshot current when this delete committed — the
    # changelog tag (changes.read_changes emits the entry to windows
    # crossing it; apply order is "inserts of commit k, then deletes
    # tagged at k"). "seq": the store-lifetime tombstone counter — the
    # change-feed stream's offset coordinate (snapshots don't advance
    # on deletes, and list positions don't survive compact_tombstones).
    seq = meta.get("delete_seq", 0) + 1
    meta["delete_seq"] = seq
    meta.setdefault("deletes", []).append(
        {"name": name, "lo": lo, "hi": hi, "rows": rows,
         "at": _snapshot_now(meta), "seq": seq}
    )
    _write_meta(path, meta)  # THE commit point
    return {"deleted_rows": rows, "name": name}


def _tombstone_summary(d: str) -> tuple[int | None, int | None, int]:
    """(min part_id, max part_id, row count) from parquet footers only;
    falls back to reading the one int column if a footer lacks stats."""
    import pyarrow.dataset as pads

    files = [
        os.path.join(d, f) for f in sorted(os.listdir(d))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    if not files:
        return None, None, 0
    ds = pads.dataset(files, format="parquet")
    rows, lo, hi, exact = 0, None, None, True
    for frag in ds.get_fragments():
        md = frag.metadata
        rows += md.num_rows
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            idx = next(
                (j for j in range(rg.num_columns)
                 if rg.column(j).path_in_schema == "part_id"),
                None,
            )
            st = rg.column(idx).statistics if idx is not None else None
            if st is None or not st.has_min_max:
                exact = False
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if rows and (not exact or lo is None):
        t = ds.to_table(columns=["part_id"])
        ids = t.column("part_id").to_pylist()
        lo, hi = min(ids), max(ids)
    return lo, hi, rows


def delete_stats(path: str) -> dict:
    """Committed tombstone summary for a store: per-dir rows + totals.
    Positional tombstones count deleted ROWS exactly; equality entries
    count delete KEYS (matched rows are only known at read time)."""
    meta = _meta(path)
    entries = meta.get("deletes") or []
    eq = meta.get("eq_deletes") or []
    return {
        "tombstone_dirs": len(entries),
        "deleted_rows": sum(e.get("rows", 0) for e in entries),
        "entries": entries,
        "eq_delete_dirs": len(eq),
        "eq_delete_keys": sum(e.get("keys", 0) for e in eq),
        "eq_entries": eq,
    }
