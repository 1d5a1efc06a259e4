"""Skew-aware join strategies.

AQE's skew-join handles sort-merge spills at runtime, but the canonical
explicit treatment for a SEVERELY hot key joined against a replicable
side is salting: fact rows on hot keys scatter across ``buckets`` salted
partitions, and the other side's hot-key rows replicate to every salt, so
no single task owns an entire hot key. Results are exactly the plain
join's (the salt is join-local and dropped) — the oracle checks that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 8,
    hot_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` with ``dim`` on ``key``, salting hot keys.

    One histogram pass over the fact side finds keys above
    ``hot_threshold`` rows; that (tiny) hot-key set broadcasts. Hot fact
    rows get salt = hash(row) % buckets, cold rows salt 0; dim rows
    replicate to all ``buckets`` salts ONLY for hot keys (cold keys stay
    single-copy), so the replication cost is |hot keys| x buckets. The
    join key becomes (key, salt) — per-task input is bounded by
    max(cold-key volume, hot-key volume / buckets).

    ``how`` is restricted to fact-preserving joins: because dim rows are
    replicated to every salt for hot keys, a right/full outer join would
    emit a spurious null-extended row for each dim replica whose salt
    bucket holds no fact rows of that key.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only {sorted(allowed)}, "
            f"got {how!r}: replicated dim rows break right/full outer semantics"
        )
    hot = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_threshold)
        .select(key, F.lit(True).alias("__hot"))
    )
    f = (
        fact.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.abs(F.hash(*[F.col(c) for c in fact.columns])), F.lit(buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    d = (
        dim.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salts",
            F.when(
                F.col("__hot").isNotNull(),
                F.array(*[F.lit(i) for i in range(buckets)]),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("__salt", F.explode("__salts"))
        .drop("__hot", "__salts")
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")
