"""n_tok-weighted, salted, skew-aware partition planning.

The reference is single-process and has no partitioning layer (SURVEY.md
§2.11); at 10^12-sequence scale the north rule makes it explicit. Strategy
(scales to 1000 executors — no global sort, no driver-side loop):

  * one cheap aggregate scan computes total and heavy-row token counts
    (column-pruned to n_tok, so the parquet scan reads one column);
  * P = ceil(total_tokens / target) buckets; normal rows are salted by
    xxhash64(doc_id) % P — with millions of rows per bucket the law of
    large numbers equalizes token mass;
  * rows with n_tok >= skew_threshold (default target/4) are routed to a
    dedicated bucket range [P, P + P_heavy) sized by their own token mass,
    so one 65k-token document never dominates a normal bucket (the
    salting-for-skew pattern, AQE can't help custom UDF fan-out).

The resulting part_id is stable across runs (hash of doc_id, not
monotonically_increasing_id), which checkpointed resume requires.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TARGET_TOKENS = 2_000_000


@dataclass
class PartitionPlan:
    n_normal: int
    n_heavy: int
    target_tokens: int
    skew_threshold: int
    total_tokens: int

    @property
    def num_partitions(self) -> int:
        return self.n_normal + self.n_heavy


def plan_partitions(
    df: DataFrame,
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    skew_threshold: int | None = None,
) -> tuple[DataFrame, PartitionPlan]:
    """Attach a stable ``part_id`` column; returns (df_with_part_id, plan)."""
    thr = skew_threshold or max(target_tokens // 4, 1)
    agg = df.select(
        F.sum("n_tok").alias("total"),
        F.sum(F.when(F.col("n_tok") >= thr, F.col("n_tok")).otherwise(0)).alias(
            "heavy"
        ),
    ).collect()[0]
    total = int(agg["total"] or 0)
    heavy = int(agg["heavy"] or 0)
    normal = total - heavy
    n_normal = max(-(-normal // target_tokens), 1)
    n_heavy = max(-(-heavy // target_tokens), 1) if heavy else 0
    salt = F.xxhash64(F.col("doc_id"))
    part_id = F.when(
        F.col("n_tok") >= thr,
        F.lit(n_normal) + F.pmod(salt, F.lit(max(n_heavy, 1))),
    ).otherwise(F.pmod(salt, F.lit(n_normal)))
    out = df.withColumn("part_id", part_id.cast("int"))
    return out, PartitionPlan(
        n_normal=n_normal,
        n_heavy=n_heavy,
        target_tokens=target_tokens,
        skew_threshold=thr,
        total_tokens=total,
    )
