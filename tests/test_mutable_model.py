"""Randomized model check of the mutable-table surface: a seeded
sequence of append / delete / upsert / add / rename / drop / compact
operations runs against a real store AND a driver-side model; after
every step the store read must equal the model exactly.

This is the cross-operation interaction net the per-feature tests can't
cast: deletes addressing rows through a later rename, upserts over
added-column defaults, compaction mid-history, tombstones surviving
appends — any divergence pinpoints the op sequence (printed seed)."""

from __future__ import annotations

import random
import shutil

import pytest

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parquet_go_spark.operators.compact import compact_store
from parquet_go_spark.operators.deletes import (
    delete_matching,
    delete_values,
    delete_where,
    merge_into,
    update_where,
    upsert_by_key,
)
from parquet_go_spark.operators.evolve import (
    add_column,
    drop_column,
    rename_column,
)
from parquet_go_spark.sources.pgs_datasource import (
    manifest_aggregates,
    register,
)

_TYPES = {"long": LongType(), "int": IntegerType(),
          "double": DoubleType(), "string": StringType()}


class _Model:
    """Driver-side mirror: rows as dicts keyed by k, plus the schema."""

    def __init__(self):
        self.fields: list[tuple[str, str]] = [
            ("k", "long"), ("a", "int"), ("b", "string")
        ]
        self.rows: dict[int, dict] = {}
        self.next_k = 0

    def schema(self) -> StructType:
        return StructType(
            [StructField(n, _TYPES[t]) for n, t in self.fields]
        )

    def fresh_batch(self, rng, n) -> list[dict]:
        out = []
        for _ in range(n):
            k = self.next_k
            self.next_k += 1
            row = {}
            for name, t in self.fields:
                if name == "k":
                    row[name] = k
                elif t == "int":
                    row[name] = rng.randrange(100)
                elif t == "long":
                    row[name] = rng.randrange(10**6)
                elif t == "double":
                    row[name] = rng.randrange(1000) / 4.0
                else:
                    row[name] = f"s{rng.randrange(50)}"
            out.append(row)
        return out

    def df(self, spark):
        cols = [n for n, _ in self.fields]
        data = [tuple(r[c] for c in cols)
                for r in sorted(self.rows.values(), key=lambda r: r["k"])]
        return spark.createDataFrame(data, self.schema())


def _changelog_check(spark, path, model, step, rng):
    """Replay-contract arm: sync a mirror at a random past snapshot,
    apply read_changes(s, now) (inserts of commit k before deletes
    tagged at=k; unknown delete addresses are no-ops), and require it
    to equal the model. Windows the changelog documents as unreadable
    (equality-delete crossings, stores without append history) skip —
    but only for those documented reasons."""
    from parquet_go_spark.operators.changes import read_changes
    from parquet_go_spark.sources.pgs_datasource import _hist_state, _meta

    meta = _meta(path)
    if meta.get("clustering") == "stream_append":
        return
    hist, base, _ = _hist_state(meta)
    if not hist:
        return
    s = rng.randrange(base, base + len(hist) + 1)
    try:
        ev = read_changes(spark, path, s).collect()
    except ValueError as exc:
        assert ("equality-delete" in str(exc)
                or "predates changelog" in str(exc)), (
            f"step {step}: unexpected changelog refusal: {exc}"
        )
        return
    cols = [n for n, _ in model.fields]
    if s == base:
        if base > 0:
            return  # snapshot `base` itself expired: nothing to sync at
        mirror = {}  # replay-from-empty: the full feed IS the table
    else:
        sync = (
            spark.read.format("pgs").option("with_pos", "true")
            .option("as_of_commit", str(s)).load(path)
        ).collect()
        mirror = {
            (r["_pgs_part"], r["_pgs_pos"]): tuple(r[c] for c in cols)
            for r in sync
        }
    for c in sorted({r["_pgs_commit"] for r in ev}):
        for r in ev:
            if r["_pgs_commit"] == c and r["_change_type"] == "insert":
                mirror[(r["_pgs_part"], r["_pgs_pos"])] = tuple(
                    r[x] for x in cols
                )
        for r in ev:
            if r["_pgs_commit"] == c and r["_change_type"] == "delete":
                mirror.pop((r["_pgs_part"], r["_pgs_pos"]), None)
    want = sorted(
        tuple(r[c] for c in cols) for r in model.rows.values()
    )
    got = sorted(mirror.values())
    assert got == want, (
        f"step {step}: changelog replay from snapshot {s} diverged "
        f"({len(got)} vs {len(want)} rows)"
    )


def _check(spark, path, model, step, rng=None):
    got = spark.read.format("pgs").load(path)
    exp = model.df(spark)
    assert got.columns == [n for n, _ in model.fields], step
    extra = got.exceptAll(exp).count()
    missing = exp.exceptAll(got).count()
    assert extra == 0 and missing == 0, (
        f"step {step}: store has {extra} extra / {missing} missing rows"
    )
    if rng is None:
        return
    # a random FILTERED read too: pushed predicates exercise stats and
    # page-index pruning over whatever alias chains / tombstones /
    # added-column defaults the sequence has built up — pruning must
    # stay lossless through all of it
    name, t = rng.choice(model.fields)
    if t == "string":
        cond = f"{name} IS NOT NULL"
    else:
        vals = [r.get(name) for r in model.rows.values()
                if r.get(name) is not None]
        pivot = rng.choice(sorted(vals)) if vals else 0
        cond = f"{name} >= {pivot}"
    fgot = got.filter(cond)
    fexp = exp.filter(cond)
    d1, d2 = fgot.exceptAll(fexp).count(), fexp.exceptAll(fgot).count()
    assert d1 == 0 and d2 == 0, f"step {step} filtered [{cond}]: {d1}/{d2}"

    # manifest-aggregate arm: whatever tombstone/evolution state the
    # sequence has built, manifest_aggregates must either REFUSE or
    # equal the mirror exactly — a wrong metadata answer is silent data
    # corruption at 100 TB scale
    name, t = rng.choice(model.fields)
    try:
        (agg,) = manifest_aggregates(path, [name])
    except ValueError:
        agg = None
    if agg is not None:
        vals = [r.get(name) for r in model.rows.values()]
        nn = [v for v in vals if v is not None]
        assert agg["count"] == len(vals), (step, name)
        assert agg["nulls"] == len(vals) - len(nn), (step, name)
        assert agg["min"] == (min(nn) if nn else None), (step, name)
        assert agg["max"] == (max(nn) if nn else None), (step, name)

    # NDV arm: for every column the store records sketches on,
    # manifest_ndv must either REFUSE (deletes/evolution in flight) or
    # equal the numpy HLL of the mirror's live values exactly — across
    # appends, DML append arms, compaction recompute, and recluster
    import pyarrow as _pa

    from parquet_go_spark import ndv as _ndv
    from parquet_go_spark.sources.pgs_datasource import (
        _meta as _m2, manifest_ndv,
    )

    _AT = {"long": _pa.int64(), "int": _pa.int32(), "string": _pa.string()}
    for name in _m2(path).get("ndv_cols") or []:
        t = dict(model.fields).get(name)
        if t not in _AT:
            continue
        try:
            (got_ndv,) = manifest_ndv(path, [name])
        except ValueError:
            continue
        vals = [r.get(name) for r in model.rows.values()]
        exp_ndv = _ndv.fold(_ndv.registers_of(_pa.array(vals, _AT[t])))
        assert got_ndv["registers_sum"] == exp_ndv["registers_sum"], (
            step, name)
        assert got_ndv["est_raw"] == exp_ndv["est_raw"], (step, name)


@pytest.mark.parametrize("seed,page_rows", [(7, None), (23, 16)])
def test_mutable_surface_model(spark, tmp_path, seed, page_rows, n_ops=10):
    register(spark)
    rng = random.Random(seed)
    path = str(tmp_path / "store0")
    model = _Model()

    # initial generation
    batch = model.fresh_batch(rng, 120)
    for r in batch:
        model.rows[r["k"]] = r
    w = spark.createDataFrame(
        [tuple(r[c] for c, _ in model.fields) for r in batch],
        model.schema(),
    ).repartition(3).write.format("pgs").mode("overwrite")
    w = w.option("ndv_cols", "k")  # NDV arm: sketch the key everywhere
    if page_rows:
        w = w.option("page_rows", str(page_rows))
    w.save(path)
    _check(spark, path, model, "init")

    added_n = 0
    gen = 0
    for step in range(n_ops):
        live = sorted(model.rows)
        op = rng.choice(
            ["append", "delete_where", "delete_keys", "delete_values",
             "update", "upsert", "merge", "add", "rename", "drop",
             "compact", "recluster", "expire", "branch"]
        )
        desc = op
        if op == "append":
            batch = model.fresh_batch(rng, rng.randrange(20, 60))
            for r in batch:
                model.rows[r["k"]] = r
            w = spark.createDataFrame(
                [tuple(r[c] for c, _ in model.fields) for r in batch],
                model.schema(),
            ).repartition(2).write.format("pgs").mode("append")
            w = w.option("ndv_cols", "k")
            if page_rows:
                w = w.option("page_rows", str(page_rows))
            w.save(path)
        elif op == "delete_where" and live:
            m, r0 = rng.choice([2, 3, 5, 7]), rng.randrange(7)
            lo = rng.choice(live)
            cond = f"(k % {m} = {r0} AND k >= {lo})"
            desc += f" {cond}"
            delete_where(spark, path, cond)
            model.rows = {k: v for k, v in model.rows.items()
                          if not (k % m == r0 and k >= lo)}
        elif op == "delete_keys" and live:
            keys = rng.sample(live, min(len(live), rng.randrange(1, 25)))
            delete_matching(
                spark, path,
                spark.createDataFrame([(k,) for k in keys], "k long"), "k",
            )
            for k in keys:
                model.rows.pop(k, None)
        elif op == "delete_values" and live:
            # equality delete scoped to NOW: keys committed, matching
            # applied by readers; a row appended later with the same k
            # must survive (the model mirrors by deleting immediately —
            # later fresh_batch ks are always new, matching the cap)
            keys = rng.sample(live, min(len(live), rng.randrange(1, 20)))
            desc += f" {len(keys)} keys"
            delete_values(
                spark, path,
                spark.createDataFrame([(k,) for k in keys], "k long"), "k",
            )
            for k in keys:
                model.rows.pop(k, None)
        elif op == "update" and live:
            m, r0 = rng.choice([2, 3, 5]), rng.randrange(3)
            cond = f"k % {m} = {r0}"
            intcols = [n for n, t in model.fields
                       if t == "int" and n != "k"]
            if not intcols:
                continue
            target = rng.choice(intcols)
            bump = rng.randrange(1, 9)
            desc += f" {cond} SET {target}+={bump}"
            update_where(
                spark, path, cond,
                {target: f"coalesce({target}, 0) + {bump}"},
            )
            for k, r in model.rows.items():
                if k % m == r0:
                    r[target] = (r.get(target) or 0) + bump
        elif op == "upsert" and live:
            repl = rng.sample(live, min(len(live), rng.randrange(1, 15)))
            batch = model.fresh_batch(rng, rng.randrange(5, 15))
            for k in repl:
                row = dict(model.rows[k])
                for name, t in model.fields:
                    if name != "k" and t == "int":
                        row[name] = rng.randrange(1000, 2000)
                batch.append(row)
            up = spark.createDataFrame(
                [tuple(r[c] for c, _ in model.fields) for r in batch],
                model.schema(),
            )
            upsert_by_key(spark, path, up, "k")
            for r in batch:
                model.rows[r["k"]] = r
        elif op == "merge" and live:
            intcols = [n for n, t in model.fields
                       if t == "int" and n != "k"]
            if not intcols:
                continue
            target = rng.choice(intcols)
            matched = rng.sample(live, min(len(live),
                                           rng.randrange(1, 12)))
            deltas = {k: rng.randrange(1, 9) for k in matched}
            fresh = model.fresh_batch(rng, rng.randrange(3, 8))
            src_rows = []
            for k in matched:
                row = dict(model.rows[k])
                row[target] = deltas[k]
                src_rows.append(row)
            src_rows += fresh
            src = spark.createDataFrame(
                [tuple(r[c] for c, _ in model.fields) for r in src_rows],
                model.schema(),
            )
            desc += f" {len(matched)} upd + {len(fresh)} ins SET {target}"
            merge_into(
                spark, path, src, "k",
                when_matched={target: f"coalesce(t.{target}, 0) + "
                                      f"coalesce(s.{target}, 0)"},
                when_not_matched=True,
            )
            for k in matched:
                r = model.rows[k]
                r[target] = (r.get(target) or 0) + deltas[k]
            for r in fresh:
                model.rows[r["k"]] = r
        elif op == "add":
            added_n += 1
            name = f"x{added_n}"
            t = rng.choice(["int", "double", "string"])
            default = {"int": 5, "double": 0.25, "string": "dflt"}[t]
            if rng.random() < 0.3:
                default = None
            desc += f" {name}:{t}={default}"
            add_column(path, name, t, default)
            model.fields.append((name, t))
            for r in model.rows.values():
                r[name] = default
        elif op == "rename":
            cand = [n for n, _ in model.fields if n != "k"]
            old = rng.choice(cand)
            added_n += 1
            new = f"r{added_n}"
            desc += f" {old}->{new}"
            rename_column(path, old, new)
            model.fields = [(new if n == old else n, t)
                            for n, t in model.fields]
            for r in model.rows.values():
                r[new] = r.pop(old)
        elif op == "drop":
            cand = [n for n, _ in model.fields if n != "k"]
            if len(cand) < 2:
                continue
            name = rng.choice(cand)
            desc += f" {name}"
            drop_column(path, name)
            model.fields = [(n, t) for n, t in model.fields if n != name]
            for r in model.rows.values():
                r.pop(name, None)
        elif op == "compact":
            gen += 1
            dst = str(tmp_path / f"store{gen}")
            shutil.rmtree(dst, ignore_errors=True)
            compact_store(spark, path, dst,
                          target_raw=rng.choice([1 << 12, 1 << 30]))
            path = dst
        elif op == "recluster":
            from parquet_go_spark.operators.compact import recluster_store

            gen += 1
            dst = str(tmp_path / f"store{gen}")
            shutil.rmtree(dst, ignore_errors=True)
            intcols = [n for n, t in model.fields if t == "int"]
            key = (
                "k" if len(intcols) < 2 or rng.random() < 0.5
                else rng.sample(["k"] + [c for c in intcols if c != "k"],
                                2)
            )
            desc += f" by {key}"
            recluster_store(spark, path, dst, key)
            path = dst
        elif op == "expire":
            from parquet_go_spark.sources.pgs_datasource import (
                _meta as _m, expire_snapshots,
            )

            hist = _m(path).get("history") or []
            if len(hist) < 2:
                continue
            keep = rng.randrange(1, len(hist))
            desc += f" keep_last={keep}"
            expire_snapshots(path, keep_last=keep)
            # pure metadata: the model's live-row mirror is unchanged
        elif op == "branch":
            from parquet_go_spark.sources.pgs_datasource import (
                _meta as _m, create_branch, drop_branch, publish_branch,
            )

            if not (_m(path).get("history") and
                    _m(path).get("generations") is not None):
                continue
            create_branch(path, "chaos")
            staged = model.fresh_batch(rng, rng.randrange(5, 15))
            w = (spark.createDataFrame(
                [tuple(r[c] for c, _ in model.fields) for r in staged],
                model.schema(),
            ).write.format("pgs").mode("append")
             .option("branch", "chaos").option("ndv_cols", "k"))
            if page_rows:
                w = w.option("page_rows", str(page_rows))
            w.save(path)
            if rng.random() < 0.5:
                desc += " publish"
                publish_branch(path, "chaos")
                for r in staged:
                    model.rows[r["k"]] = r
            else:
                desc += " drop"
                drop_branch(path, "chaos")
                # staged rows never reach main: model unchanged
        else:
            continue
        _check(spark, path, model, f"{step}:{desc} (seed {seed})", rng)
        _changelog_check(spark, path, model,
                         f"{step}:{desc} (seed {seed})", rng)
