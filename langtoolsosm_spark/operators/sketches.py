"""Approximate aggregate sketches — HyperLogLog distinct counting with
deterministic md5-derived registers.

Why not Spark's approx_count_distinct: its HLL++ register hashing is not
reproducible outside the JVM, so it can't be oracle-checked. This sketch
uses h = md5(value): register = first 8 hash bits, rho = (leading zeros of
the next 64 bits) + 1, capped at RHO_CAP — every step is md5 + string +
integer arithmetic, identical in Spark and DuckDB.

Scale properties (the reason HLL exists at 100 TB): the register table is
the sketch — a map-side-combinable groupBy(register).max(rho) whose output
is at most 2^p rows regardless of input size, mergeable across
partitions/days/tables by pairwise max. The estimate is pure arithmetic
over the (tiny) register set.

Estimate arithmetic is kept EXACT for the oracle: per-register terms
2^(RHO_CAP - rho) are integers (sum <= 2^p * 2^RHO_CAP fits a long), and
the final alpha * m^2 / sum is one identical float expression both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P_BITS = 8  # 256 registers
M = 1 << P_BITS
RHO_CAP = 40
SCALE = 1 << RHO_CAP  # exact integer weight of an untouched register
ALPHA = 0.7213 / (1.0 + 1.079 / float(M))
# single precomputed double constant -> the oracle inlines repr(EST_K)
# and the whole estimate reduces to one division + round (no float
# expression tree to keep in sync across engines)
EST_K = 1000.0 * ALPHA * float(M * M) * float(SCALE)


def hll_reg_rho(col: str) -> tuple[F.Column, F.Column]:
    """(register, rho) column expressions for one value column.

    rho = 4 * (leading '0' hex digits of the 64-bit part) + (leading zero
    bits of the first nonzero digit) + 1, capped — pure string/integer
    ops, no platform float anywhere. Shared by the batch sketch and the
    streaming stateful counter (which merges these JVM-computed registers
    in a NumPy kernel, so no Python hashing exists anywhere)."""
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    hexpart = F.substring(h, 3, 16)
    lz = F.length(F.regexp_extract(hexpart, "^(0*)", 1))
    d = F.substring(hexpart, lz + 1, 1)
    v = F.when(d == "", F.lit(0)).otherwise(F.conv(d, 16, 10).cast("int"))
    extra = (
        F.when(v >= 8, F.lit(0))
        .when(v >= 4, F.lit(1))
        .when(v >= 2, F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = F.least(lz * 4 + extra + 1, F.lit(RHO_CAP)).cast("int")
    return reg, rho


def estimate_from_registers(regs_rho) -> int:
    """Exact-integer estimate from a dense register vector (numpy array of
    rho values, 0 = untouched) — same arithmetic as ``hll_estimate``."""
    import numpy as np

    r = np.asarray(regs_rho, dtype=np.int64)
    occupied = int((r > 0).sum())
    sum_scaled = int((np.int64(1) << (RHO_CAP - r[r > 0])).sum()) + (M - occupied) * SCALE
    return int(round(EST_K / float(sum_scaled)))


def hll_registers(
    df: DataFrame, col: str, out_reg: str = "register", out_rho: str = "max_rho"
) -> DataFrame:
    """Occupied HLL registers: (register int, max_rho int), <= 2^p rows.
    Mergeable: union two register tables and re-take max(rho)."""
    reg, rho = hll_reg_rho(col)
    return (
        df.select(reg.alias(out_reg), rho.alias("__rho"))
        .groupBy(out_reg)
        .agg(F.max("__rho").alias(out_rho))
    )


def quantile_buckets(df: DataFrame, col: str) -> DataFrame:
    """DDSketch-style log-bucket histogram over a non-negative numeric
    column, with PURE integer/bit bucketing (no float log — engines
    disagree in the last ulp of libm functions, which would flip bucket
    boundaries): x is quantized to milli-units, and the bucket key is
    (bit_length * 16 + top-4-bits), i.e. gamma = 2^(1/8) ~ 9% relative
    error; values <= 15 get exact unit buckets. bit_length comes from
    length(bin(x)) — identical strings in Spark and DuckDB.

    Mergeable: bucket tables from different partitions/tables add up
    (sum of counts). Size is bounded by ~16 * 64 buckets regardless of N.
    """
    x = f"CAST(round(CAST({col} AS DOUBLE) * 1000.0) AS BIGINT)"
    bucket = (
        f"CASE WHEN {x} <= 15 THEN {x} "
        f"ELSE length(bin({x})) * 16 + shiftright({x}, length(bin({x})) - 4) END"
    )
    return (
        df.filter(F.col(col).isNotNull() & (F.col(col) >= 0))
        .select(F.expr(bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_estimate(
    df: DataFrame, col: str, qs_milli: tuple[int, ...] = (500, 900, 990)
) -> DataFrame:
    """Quantile estimates from the bucket sketch: per requested q (in
    milli), the midpoint of the first bucket whose cumulative count
    reaches ceil(q * N) — all integer arithmetic, so the estimate is
    bit-reproducible in the oracle. Output (q_milli, est_milli, n_total).
    """
    from pyspark.sql import Window

    b = quantile_buckets(df, col)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    qdf = df.sparkSession.createDataFrame(
        [(q,) for q in qs_milli], "q_milli int"
    )
    # bucket midpoint in milli-units: exact for unit buckets, integer
    # range midpoint for log buckets
    mid = (
        "CASE WHEN bucket <= 15 THEN bucket ELSE "
        "div(shiftleft(bucket % 16, div(bucket, 16) - 4) "
        "+ shiftleft(bucket % 16 + 1, div(bucket, 16) - 4) - 1, 2) END"
    )
    hit = (
        qdf.crossJoin(cum)
        .filter(F.col("cum") * 1000 >= F.col("q_milli") * F.col("total"))
        .groupBy("q_milli")
        .agg(F.min("bucket").alias("bucket"), F.max("total").alias("n_total"))
    )
    return hit.select(
        "q_milli", F.expr(mid).cast("long").alias("est_milli"), "n_total"
    )


def grouped_quantile_estimate(
    df: DataFrame,
    col: str,
    group_col: str,
    qs_milli: tuple[int, ...] = (500, 900),
) -> DataFrame:
    """Per-GROUP quantile estimates from per-group bucket sketches — the
    OLAP shape the global sketch can't answer (p50/p90 latency per
    endpoint, token-count percentiles per source). Same integer/bit
    bucketing and rank walk as the global pair, keyed by ``group_col``
    everywhere: one (group, bucket) map-side-combined aggregate, windows
    partitioned by group, so state per group is the bounded sketch, not
    the raw values. Output (group, q_milli, est_milli, n_total)."""
    from pyspark.sql import Window

    x = f"CAST(round(CAST({col} AS DOUBLE) * 1000.0) AS BIGINT)"
    bucket = (
        f"CASE WHEN {x} <= 15 THEN {x} "
        f"ELSE length(bin({x})) * 16 + shiftright({x}, length(bin({x})) - 4) END"
    )
    b = (
        df.filter(F.col(col).isNotNull() & (F.col(col) >= 0))
        .select(F.col(group_col), F.expr(bucket).alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = b.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy(group_col))
    )
    qdf = df.sparkSession.createDataFrame([(q,) for q in qs_milli], "q_milli int")
    mid = (
        "CASE WHEN bucket <= 15 THEN bucket ELSE "
        "div(shiftleft(bucket % 16, div(bucket, 16) - 4) "
        "+ shiftleft(bucket % 16 + 1, div(bucket, 16) - 4) - 1, 2) END"
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") * 1000 >= F.col("q_milli") * F.col("total"))
        .groupBy(group_col, "q_milli")
        .agg(F.min("bucket").alias("bucket"), F.max("total").alias("n_total"))
    )
    return hit.select(
        group_col, "q_milli", F.expr(mid).cast("long").alias("est_milli"), "n_total"
    )


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """Single-row HLL estimate: (m, occupied, sum_scaled, est_milli).

    sum_scaled = sum over ALL m registers of 2^(RHO_CAP - rho) (rho = 0
    for untouched registers) — exact integer. est_milli = round(1000 *
    alpha_m * m^2 * 2^RHO_CAP / sum_scaled), alpha inlined as the same
    float expression in the DuckDB oracle."""
    regs = hll_registers(df, col)
    agg = regs.agg(
        F.count(F.lit(1)).alias("occupied"),
        # column-valued shift amount -> SQL expr (F.shiftleft needs an int)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - max_rho)")).alias(
            "__occ_sum"
        ),
    )
    sum_scaled = (
        F.col("__occ_sum")
        + (F.lit(M).cast("long") - F.col("occupied")) * F.lit(SCALE).cast("long")
    )
    est = F.round(F.lit(EST_K) / F.col("sum_scaled").cast("double")).cast("long")
    return agg.withColumn("sum_scaled", sum_scaled.cast("long")).select(
        F.lit(M).cast("int").alias("m"),
        F.col("occupied").cast("long").alias("occupied"),
        "sum_scaled",
        est.alias("est_milli"),
    )


CMS_DEPTH = 3
CMS_WIDTH = 64
CMS_SALTS = ("cms0:", "cms1:", "cms2:")


def cms_bucket(col: F.Column, salt: str, width: int = CMS_WIDTH) -> F.Column:
    """Count-min bucket for one hash row: first 32 md5 bits of
    (salt || value) mod ``width`` — the same engine-portable md5-prefix
    hashing the HLL and the samplers use (no JVM-internal hash)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return h % width


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    mass_denom: int = 256,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min-sketch heavy hitters with a self-scaling mass threshold:
    report every key whose CMS estimate (min over CMS_DEPTH hash rows of
    the bucket counter) holds at least 1/``mass_denom`` of total row
    mass, alongside its exact count — the sketch answer and its ground
    truth in one frame, so the CMS one-sided guarantee
    (``cms_est >= exact_n``) is checkable row by row. The threshold
    comparison is exact integer cross-multiplication
    (est * mass_denom >= total). Returns
    (key, cms_est, exact_n, total_n).

    Scale story (why a sketch when the exact groupBy also runs): the
    counter table IS the sketch — a map-side-combined groupBy over
    (row, bucket) whose output is at most CMS_DEPTH * width rows
    regardless of input size, mergeable across partitions/days/streams
    by bucket-wise addition. Candidate scoring joins the (tiny,
    broadcast) counter table CMS_DEPTH times against the distinct-key
    frame; at 100x the events the only growing frame is the occupied-key
    histogram. The exact count column rides along from that same
    histogram — at true 100 TB one would drop it and keep only the
    sketch side, which never sees a per-key shuffle.
    """
    key = F.col(key_col)
    rows = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            cms_bucket(key, CMS_SALTS[i], width).alias("bucket"),
        )
        for i in range(CMS_DEPTH)
    ])
    hashed = df.select(key.alias("key"), rows.alias("__rows"))
    counters = (
        hashed.select(F.explode("__rows").alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = hashed.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    return cms_score(exact, counters, mass_denom, width)


def cms_score(
    exact: DataFrame,
    counters: DataFrame,
    mass_denom: int = 256,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Score a (key, exact_n) histogram against a prebuilt CMS counter
    table (row, bucket, c) — the shared back half of
    ``cms_heavy_hitters``, also fed by the streaming kernel's final
    counter states (streaming/microbatch.py ``stream_cms_hitters``),
    so batch and stream provably share the threshold semantics."""
    total = exact.agg(F.sum("exact_n").alias("total_n"))
    scored = exact
    for i in range(CMS_DEPTH):
        ci = counters.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"__b{i}"), F.col("c").alias(f"__c{i}")
        )
        scored = scored.withColumn(
            f"__b{i}", cms_bucket(F.col("key"), CMS_SALTS[i], width)
        ).join(F.broadcast(ci), f"__b{i}")
    est = F.least(*[F.col(f"__c{i}") for i in range(CMS_DEPTH)])
    return (
        scored.withColumn("cms_est", est)
        .crossJoin(F.broadcast(total))
        .filter(F.col("cms_est") * mass_denom >= F.col("total_n"))
        .select("key", "cms_est", "exact_n", "total_n")
    )


def ks_two_sample(
    df,
    group_a: str,
    group_b: str,
    value_col: str = "value",
    group_col: str = "event_type",
    q_scale: int = 1000,
):
    """Exact two-sample Kolmogorov-Smirnov statistic between two groups'
    value distributions — the drift detector a data pipeline runs when a
    source starts emitting differently: D = max over x of
    |ECDF_a(x) - ECDF_b(x)|, computed EXACTLY as the cross-multiplied
    integer rational

        d_num = max |c_a(y) * n_b - c_b(y) * n_a|,   d_den = n_a * n_b

    over quantized values y = round(value * q_scale) (the engine's
    standard quantization: float ECDF subtraction is order-dependent,
    integer cross-products are not). Also reports ``at_y``, the
    smallest y achieving the max — where the distributions split.
    Returns ONE row (n_a, n_b, d_num, d_den, at_y).

    Plan: one filtered two-group histogram by (y), one cumulative
    window ordered by y (input bounded by DISTINCT quantized values —
    the zone_concurrency precedent), one single-row argmax via
    min-struct. No joins on fact-sized frames."""
    from pyspark.sql import DataFrame, Window, functions as F

    assert isinstance(df, DataFrame)
    if group_a == group_b:
        raise ValueError("ks_two_sample: group_a and group_b must differ")
    y = F.round(F.col(value_col).cast("double") * q_scale).cast("long")
    hist = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .select(
            y.alias("y"),
            F.when(F.col(group_col) == group_a, F.lit(1))
            .otherwise(F.lit(0)).alias("ia"),
        )
        .groupBy("y")
        .agg(
            F.sum("ia").alias("da"),
            F.sum(F.lit(1) - F.col("ia")).alias("db"),
        )
    )
    # explicit NULLS LAST: Spark's bare orderBy sorts nulls FIRST while
    # the DuckDB oracle's ORDER BY y is NULLS LAST — on a fixture with a
    # NULL value the cumulative ECDF would diverge (round-7 ADVICE)
    w = Window.orderBy(F.col("y").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "y",
        F.sum("da").over(w).alias("ca"),
        F.sum("db").over(w).alias("cb"),
    )
    tot = hist.agg(
        F.sum("da").alias("n_a"), F.sum("db").alias("n_b")
    )
    gap = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a", "n_b",
            F.abs(
                F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
            ).alias("g"),
            "y",
        )
    )
    res = gap.groupBy("n_a", "n_b").agg(
        # lexicographic max over (gap, -y): max gap, then SMALLEST y
        F.max(
            F.struct(F.col("g").alias("g"), (-F.col("y")).alias("ny"))
        ).alias("m")
    )
    return res.select(
        "n_a", "n_b",
        F.col("m.g").alias("d_num"),
        (F.col("n_a") * F.col("n_b")).alias("d_den"),
        (-F.col("m.ny")).alias("at_y"),
    )
