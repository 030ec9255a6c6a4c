"""Dedup-family guards: shingle-pipeline plan shape and minhash quality.

Two plan pathologies were found and fixed by reading the physical plan
(operators/dedup.py `_shingles`); these tests pin the fixes:

  1. Predicate pushdown moved a `size(shingles) > 0` filter below the
     fan-out exchange, re-deriving the whole shingle array single-task
     on the unsplit scan.
  2. Projection collapse inlined the shingle-array build into every
     consumer of the `shingles` column, re-running the O(words) array
     construction once per exploded OUTPUT row (~52x the work).

Plus a statistical guard on the md5 minhash family: the 16 affine
permutations (a_k*v + b_k mod p) must behave independently WITHIN a
band — a correlated family collapses each 4-hash band toward one
effective hash and floods the LSH join with false-positive candidates
(observed: 166 candidate pairs vs 25 with an independent family on the
sf0.01 corpus).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_shingle_build_stays_above_fanout_exchange(spark):
    """No shingle-array construction below the Exchange: the pre-shuffle
    Filter/Scan section of the plan must not contain the array build
    (array_distinct / transform), only the cheap size(split(...)) guard."""
    plan = _plan(dedup._shingles(dedup._docs(spark, SF)))
    lines = plan.splitlines()
    # section order in 'formatted' output follows the operator ids; find
    # the Exchange node and every node listed BELOW it (higher id = later
    # section, child nodes precede it in the tree dump)
    tree_end = next(i for i, ln in enumerate(lines) if ln.strip() == "")
    tree = lines[:tree_end]
    exchange_depth = None
    below = []
    for ln in tree:
        if "Exchange" in ln:
            exchange_depth = len(ln) - len(ln.lstrip())
        elif exchange_depth is not None:
            if len(ln) - len(ln.lstrip()) > exchange_depth:
                below.append(ln)
    assert below, plan  # the fan-out exchange must exist at sandbox scale
    # no Filter condition anywhere in the plan may contain the expensive
    # array build (filters sit below the exchange after pushdown)
    for section in plan.split("\n\n"):
        head = section.split("\n", 1)[0]
        if "Filter" in head:
            assert "array_distinct" not in section, section


def test_shingle_array_built_once_per_input_row(spark):
    """The generator input must be an attribute reference to a prior
    Project (array bound once per input row), not the inlined build; and
    exactly ONE node in the plan may carry the array_distinct build."""
    plan = _plan(dedup._shingles(dedup._docs(spark, SF)))
    building = [
        s for s in plan.split("\n\n")
        if "array_distinct" in s and s.startswith("(")
    ]
    assert len(building) == 1, plan
    assert building[0].split("\n", 1)[0].split(")")[1].strip().startswith(
        "Project"
    ), building[0]


def test_fan_out_noop_on_wide_scans(spark):
    """_fan_out must not add an exchange when the scan already has at
    least half as many splits as the cluster has slots."""
    df = spark.range(0, 1000, 1, 64).withColumn("doc_id", F.col("id"))
    assert dedup._fan_out(df, "doc_id") is df


def test_minhash_band_independence(spark):
    """Within-band hash independence: LSH candidates must stay close to
    the exact-Jaccard pair count, not explode. With the corpus's 25
    true pairs at >= 0.2 Jaccard, an independent family yields ~the
    same candidate set; the correlated A + k*B family yielded 6x."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_query(spark, SF)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_query(spark, SF).collect()
    }
    n_docs = dedup._docs(spark, SF).count()
    # recall on strong pairs (>= 0.5 Jaccard: expected band hit prob
    # 1-(1-s^4)^4 >= 0.23; the synthetic corpus's near-dups sit far
    # higher) and precision vs corpus size
    if exact:
        assert len(exact & cand) / len(exact) >= 0.8, (exact, cand)
    assert len(cand) <= max(5 * max(len(exact), 1), n_docs // 10), (
        len(cand), len(exact), n_docs,
    )


def test_minhash_signature_values_stable(spark):
    """Pin two signature values so the affine constants / base-hash
    derivation can't drift without the oracle changing in lockstep
    (the DuckDB oracle re-derives the same family from the same
    constants; this pin catches accidental Spark-side-only edits)."""
    sig = (
        dedup.minhash_signatures(dedup._docs(spark, SF))
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    o = con.execute(
        dedup._minhash_sig_sql()
        + " SELECT * FROM sigs ORDER BY doc_id LIMIT 1"
    ).fetchone()
    assert sig["doc_id"] == o[0]
    for k in range(dedup.N_HASHES):
        assert sig[f"h{k}"] == o[1 + k], (k, sig[f"h{k}"], o[1 + k])


# ------------------------------------------------- hot-key skew guards

def _write_docs(spark, tmp_path, rows):
    """rows: list of (doc_id, text). Written as a documents.parquet dir so
    the query entry points read it like a testdata sf dir."""
    path = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")
    return path


def test_ngram_hot_shingle_cap_drops_only_hot_pairs(spark, tmp_path):
    """One boilerplate shingle shared by every doc must not pair the whole
    corpus. With the cap: the pair that co-occurs ONLY on the hot shingle
    disappears, a genuinely near-dup pair survives, and its Jaccard is a
    lower bound of the uncapped value (full denominators kept)."""
    hot = "lorem ipsum dolor"
    rows = [
        # near-dup pair: share 4 real shingles + the hot one
        ("a", f"{hot} alpha beta gamma delta epsilon zeta"),
        ("b", f"{hot} alpha beta gamma delta epsilon eta"),
        # unrelated docs: share ONLY the hot shingle
        ("c", f"{hot} one two three four"),
        ("d", f"{hot} five six seven eight"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_query(spark, sf).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_query(
            spark, sf, max_shingle_docs=3
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    assert ("a", "b") in capped
    # c/d co-occur only via the hot shingle -> gone under the cap
    assert all("c" not in p and "d" not in p for p in capped)
    # conservative: capped jaccard never exceeds the uncapped value
    for p, j in capped.items():
        assert j <= uncapped[p] + 1e-9, (p, j, uncapped[p])


def test_ngram_hot_shingle_cap_plan_broadcasts_hot_set(spark):
    """The anti-join against the hot-shingle set must broadcast (the hot
    set is metadata-scale); a shuffled anti-join would add a full
    exchange of the exploded corpus."""
    df = dedup.ngram_jaccard_query(spark, SF, max_shingle_docs=100)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_minhash_bucket_cap_degrades_gracefully(spark, tmp_path):
    """Docs with identical text land in one (band, sig) bucket per band;
    capping bucket size drops oversized buckets but identical docs are
    still paired via their other (equally-sized, also-capped...) buckets
    — so use a corpus where only SOME buckets blow the cap: the empty
    text class. Distinct near-dups must survive the cap."""
    rows = [(f"e{i}", "") for i in range(8)]  # degenerate: 8 empty docs
    rows += [
        ("x", "the quick brown fox jumps over the lazy dog today ok"),
        ("y", "the quick brown fox jumps over the lazy dog today yes"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_query(spark, sf).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_query(
            spark, sf, max_bucket_docs=4
        ).collect()
    }
    assert capped <= uncapped
    # the empty-doc class (8 docs > cap 4 in every band) emits no pairs
    assert all(not (a.startswith("e") and b.startswith("e"))
               for a, b in capped), capped
    # the genuine near-dup pair (bucket size 2 <= cap) survives
    assert ("x", "y") in capped, capped


def test_substring_spans_hand_computed(spark, tmp_path):
    """Cross-doc share, intra-doc repeat, and overlapping-window merge,
    against hand-computed window/span/token counts (W=8)."""
    P = " ".join(f"p{i}" for i in range(8))   # 8-word shared phrase
    Q = " ".join(f"q{i}" for i in range(8))   # 8-word intra-doc repeat
    R = " ".join(f"r{i}" for i in range(9))   # 9-word phrase -> 2 windows
    rows = [
        ("d1", f"a1 a2 {P} b1 b2"),   # P at pos 2: 1 window, 1 span, 8 tok
        ("d2", f"c1 c2 c3 {P}"),      # P at pos 3: 1 window, 1 span, 8 tok
        ("d3", f"{Q} m1 {Q}"),        # Q at pos 0 and 9: 2 windows, 2 spans
        ("d4", " ".join(f"u{i}" for i in range(12))),  # all unique: absent
        ("d5", R),                    # R windows at 0,1: merged span of 9
        ("d6", f"e1 {R}"),            # R windows at 1,2: merged span of 9
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["dup_windows"], r["dup_spans"], r["dup_tokens"])
        for r in dedup.substring_spans_query(spark, sf).collect()
    }
    assert got == {
        "d1": (1, 1, 8),
        "d2": (1, 1, 8),
        "d3": (2, 2, 16),
        "d5": (2, 1, 9),
        "d6": (2, 1, 9),
    }, got


def test_substring_scrub_keeps_first_occurrence(spark, tmp_path):
    """Keeper = globally-first (doc_id, pos) occurrence; all other
    occurrences' words are removed; clean docs pass through verbatim."""
    P = " ".join(f"p{i}" for i in range(8))
    Q = " ".join(f"q{i}" for i in range(8))
    R = " ".join(f"r{i}" for i in range(9))
    d4_text = " ".join(f"u{i}" for i in range(12))
    rows = [
        ("d1", f"a1 a2 {P} b1 b2"),
        ("d2", f"c1 c2 c3 {P}"),
        ("d3", f"{Q} m1 {Q}"),
        ("d4", d4_text),
        ("d5", R),
        ("d6", f"e1 {R}"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.substring_scrub_query(spark, sf).collect()
    }
    assert got == {
        "d1": (f"a1 a2 {P} b1 b2", 0),  # keeper of P: untouched
        "d2": ("c1 c2 c3", 8),          # loses its P copy
        "d3": (f"{Q} m1", 8),           # intra-doc repeat: second Q goes
        "d4": (d4_text, 0),             # no duplicates: verbatim
        "d5": (R, 0),                   # keeper of both R windows
        "d6": ("e1", 9),                # overlapping windows merge: R goes
    }, got


def test_window_build_stays_in_one_generate(spark):
    """The W-word window hash build (concat_ws over a slice) must appear
    exactly once, inside the Generate above the fan-out exchange — the
    same projection-collapse / pushdown traps _shingles pins. Below the
    exchange only the cheap size(split(...)) guard is allowed."""
    plan = _plan(dedup._windows(dedup._docs(spark, SF)))
    assert plan.count("concat_ws") == 1, plan
    for section in plan.split("\n\n"):
        head = section.split("\n", 1)[0]
        if "Filter" in head or "Scan" in head:
            assert "concat_ws" not in section and "transform" not in section, (
                head, section)
