"""As-of (temporal) join — for each left row, the most recent right row at
or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do — the DuckDB oracle uses
its built-in as the independent formulation). The engine expresses it as a
union + window carry-forward, which is the shuffle-minimal distributed
plan: ONE shuffle on (key) to sort-merge both sides, then a running
``last(ignorenulls)`` carries the latest right payload into each left row.
No join node at all, so there is no range-explosion risk when keys have
many rows on both sides (a naive ``l.ts >= r.ts`` range join is quadratic
per key).

Reference analogue: none (the reference is batch lookup only) — this is
part of the engine's training-pipeline operator set (windowed event
enrichment), same family as sessionize (SURVEY.md §2.5, §2.9).

Determinism: right rows sort before left rows at equal timestamps
(backward as-of includes same-instant matches), and callers must dedupe
the right side to one row per (key, ts) — the fixture uses a
row_number-by-id pick — so output is parallelism-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    max_dt: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Interval (range) join: all (left, right) pairs per key with
    |left_ts - right_ts| <= max_dt — the Flink interval-join shape.

    A naive ``ON l.ts BETWEEN r.ts - D AND r.ts + D`` range join is
    quadratic per key; here both sides bucket by floor(ts / max_dt) and
    the left side probes its bucket and the two adjacent ones (an exact
    cover of the +-max_dt window), so the shuffle is a plain equi-join on
    (key, bucket) and candidates are bounded by bucket occupancy. Each
    qualifying pair matches exactly one bucket offset -> no dedup needed.
    Returns left/right ts + all key cols + dt = left_ts - right_ts.
    """
    def floor_div(col: str) -> F.Column:
        # exact integer floor division: floor(ts / D) via double division
        # silently misbuckets timestamps above 2^53 (ns epochs) — the
        # double cast drops low bits and a boundary pair can land 2
        # buckets apart, past the +-1 probe. div() on the pmod-adjusted
        # numerator stays in long arithmetic and is exact at any
        # magnitude (and correct for negative ts, where truncation alone
        # would round the wrong way).
        return F.expr(f"div(`{col}` - pmod(`{col}`, {max_dt}), {max_dt})")

    r = right.select(
        *key_cols,
        *[F.col(c).alias(f"right_{c}") for c in right_cols],
        F.col(right_ts).alias("__rts"),
        floor_div(right_ts).alias("__b"),
    )
    l = left.select(
        *key_cols,
        *[F.col(c).alias(f"left_{c}") for c in left_cols],
        F.col(left_ts).alias("__lts"),
        F.explode(
            F.array(
                *[(floor_div(left_ts) + o).cast("long") for o in (-1, 0, 1)]
            )
        ).alias("__b"),
    )
    return (
        l.join(r, [*key_cols, "__b"])
        .filter(F.abs(F.col("__lts") - F.col("__rts")) <= max_dt)
        .select(
            *key_cols,
            *[f"left_{c}" for c in left_cols],
            *[f"right_{c}" for c in right_cols],
            F.col("__lts").alias(f"left_{left_ts}"),
            F.col("__rts").alias(f"right_{right_ts}"),
            (F.col("__lts") - F.col("__rts")).alias("dt"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: left columns + ``__matched_ts`` + value_cols
    from the latest right row with ``right_ts <= left_ts`` per key
    (null-filled when no prior right row, or when older than
    ``tolerance`` time units).
    """
    rv = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c) for c in value_cols],
    )
    r = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        rv.alias("__rv"),
    )
    rv_ddl = r.schema["__rv"].dataType.simpleString()
    lp = F.struct(*[F.col(c) for c in left.columns])
    lp_ddl = "struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields
    ) + ">"
    l = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(rv_ddl).alias("__rv"),
        lp.alias("__lp"),
    )
    r = r.withColumn("__lp", F.lit(None).cast(lp_ddl))
    u = l.unionByName(r)
    # third sort key: among right rows sharing (key, ts) the LARGEST
    # (matched_ts, value...) struct sorts last and wins last() — without
    # it the pick among exact duplicates would follow shuffle order and
    # differ across parallelism (SURVEY §7.3 determinism contract)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("__ts").asc(), F.col("__is_r").desc(),
            F.col("__rv").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w)).filter(
        F.col("__is_r") == 0
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__m",
            F.when(
                F.col("__m.__matched_ts") >= F.col("__ts") - tolerance, F.col("__m")
            ),
        )
    out_cols = [F.col(f"__lp.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__matched_ts").alias("__matched_ts"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"matched_{c}") for c in value_cols)
    return carried.select(*out_cols)


def funnel_steps(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered FUNNEL completion — the product-analytics primitive: how
    many entities performed step 1, then step 2 STRICTLY AFTER their
    earliest step 1, then step 3 strictly after that earliest step 2
    (greedy earliest-completion semantics — deterministic, and the
    standard funnel definition: an entity converts iff the ordered
    subsequence exists, which greedy-earliest detects exactly). Returns
    ONE row: (n_entities, n_step1, ..., n_stepK).

    Plan: one filtered min-timestamp rollup per step, each joined to
    the previous step's per-entity earliest time (entity-keyed,
    shuffle-partitioned on the same key so the chain co-locates); K
    passes over the filtered fact slices, never a window over raw
    events. Tie-safe: min(ts) is deterministic and 'strictly after'
    makes same-timestamp step pairs NOT count (documented)."""
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {len(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    base = events.select(
        F.col(entity_col).alias("entity"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    prev = (
        base.filter(F.col("t") == steps[0])
        .groupBy("entity")
        .agg(F.min("ts").alias("step_ts"))
        .localCheckpoint(eager=True)  # each step feeds its count AND the
        # next join; pin so the chain evaluates each stage once
    )
    out = base.agg(
        F.count_distinct(F.col("entity")).alias("n_entities")
    ).crossJoin(prev.agg(F.count(F.lit(1)).alias("n_step1")))
    for i, st in enumerate(steps[1:], start=2):
        prev = (
            base.filter(F.col("t") == st)
            .join(prev, "entity")
            .filter(F.col("ts") > F.col("step_ts"))
            .groupBy("entity")
            .agg(F.min("ts").alias("step_ts"))
            .localCheckpoint(eager=True)
        )
        out = out.crossJoin(
            prev.agg(F.count(F.lit(1)).alias(f"n_step{i}"))
        )
    return out


def type_transitions(
    events: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order TRANSITION MATRIX of event types: for every ordered
    pair (from_type, to_type), how many consecutive same-entity event
    pairs step from one to the other, plus the from-state marginal —
    the sufficient statistics of the behavioral Markov chain (row
    normalization n_pairs / n_from is the estimated transition
    probability, left rational). Self-loops count; ordering is the
    engine-standard (ts, event_id) total order. Returns
    (from_type, to_type, n_pairs, n_from).

    Plan: one lag window per entity, one pair rollup, one from-marginal
    rollup joined back (broadcast-sized: |types|^2 rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("entity").orderBy("ts", "eid")
    pairs = (
        events.select(
            F.col(entity_col).alias("entity"),
            F.col(type_col).alias("to_type"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    marg = pairs.groupBy("from_type").agg(F.sum("n_pairs").alias("n_from"))
    return pairs.join(F.broadcast(marg), "from_type").select(
        "from_type", "to_type", "n_pairs", "n_from"
    )
