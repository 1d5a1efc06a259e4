"""Round-8 optimization parity pins: every rewritten execution path must
stay byte-identical to the (kept) reference formulation it replaced.

The optimization round's contract is "same rows, faster plan" — these
tests pin the "same rows" half on the deterministic sf0.01 fixtures so a
kernel regression is caught before the oracle gate."""

import pytest
from pyspark.sql import functions as F


def _sorted_pdf(df):
    cols = sorted(df.columns)
    return df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_ivf_kernel_matches_join(spark, emb):
    """Masked-matmul IVF rescore == candidate-join formulation."""
    from langtoolsosm_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_join,
    )

    got = _sorted_pdf(ivf_ann_topk(emb))
    exp = _sorted_pdf(ivf_ann_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_ivf_lloyd_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        ivf_lloyd_ann_topk,
        ivf_lloyd_ann_topk_join,
    )

    got = _sorted_pdf(ivf_lloyd_ann_topk(emb))
    exp = _sorted_pdf(ivf_lloyd_ann_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_lsh_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        ann_lsh_topk,
        ann_lsh_topk_join,
    )

    got = _sorted_pdf(ann_lsh_topk(emb))
    exp = _sorted_pdf(ann_lsh_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_lsh_kernel_nondefault_params(spark, emb):
    """Parity must hold off the default config too (different table/bit
    geometry exercises the probe-mask indexing)."""
    from langtoolsosm_spark.operators.similarity import (
        ann_lsh_topk,
        ann_lsh_topk_join,
    )

    kw = dict(k=3, n_tables=2, n_bits=4, probe_radius=1)
    got = _sorted_pdf(ann_lsh_topk(emb, **kw))
    exp = _sorted_pdf(ann_lsh_topk_join(emb, **kw))
    assert got.equals(exp) and len(got) > 0


def test_ivf_kernel_sharded_queries(spark, emb):
    """Tiny shard_rows forces the multi-broadcast sharded query path —
    must be byte-identical to the single-shard answer."""
    from langtoolsosm_spark.operators.similarity import (
        _ivf_topk_kernel,
        _quantized_vecs,
        ivf_ann_topk,
    )

    cents = _quantized_vecs(
        emb.filter(F.col("vec_id") < 16), "vec_id", "embedding", "__cv"
    ).withColumnRenamed("vec_id", "centroid_id")
    got = _sorted_pdf(
        _ivf_topk_kernel(emb, cents, 5, 8, "vec_id", "embedding", shard_rows=3)
    )
    exp = _sorted_pdf(ivf_ann_topk(emb))
    assert got.equals(exp) and len(got) > 0


def test_lsh_pairs_first_match_band_matches_distinct(spark):
    """First-match-band pair emission == banded join + DISTINCT, on a
    fixture with real dup clusters AND a null-text doc (null sigs /
    buckets must neither match nor suppress later-band matches)."""
    from langtoolsosm_spark.operators.dedup import (
        _banded,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, f"the quick brown fox {i % 7} jumps over the lazy dog") for i in range(60)]
    rows += [(100 + i, None) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = _sorted_pdf(lsh_candidate_pairs(docs))

    sigs = minhash_signatures(docs)
    keyed = _banded(sigs, 4, 2, "doc_id")
    a, c = keyed.alias("a"), keyed.alias("b")
    exp = _sorted_pdf(
        a.join(c, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    assert got.equals(exp) and len(got) > 0


def test_co_visitation_block_kernel_matches_join(spark):
    """Block-partitioned presence-matrix co_visitation == the
    within-(tile, day) self-join + countDistinct rollup, on a fixture
    with multi-tile same-day co-presence (the day-dedup case) and
    entities spread across several hash blocks."""
    import datetime

    from langtoolsosm_spark.operators.tiling import co_visitation

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for day in range(6):
        for u in range(40):
            for visit in range(2):
                # users co-locate in overlapping groups; two tiles per day
                lat = 10.0 + ((u + visit) % 4) * 0.01
                lon = 20.0 + (u % 3) * 0.01 + day * 0.001
                rows.append(
                    (u, base + datetime.timedelta(days=day, minutes=u + visit),
                     lat, lon)
                )
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, lat double, lon double"
    )
    got = _sorted_pdf(co_visitation(ev, res=9, min_days=3))

    # reference: the pre-r8 join formulation inlined
    n = 1 << 9
    fx = F.floor((F.col("lon") + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    fy = F.floor((F.col("lat") + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    tile = (
        F.least(F.greatest(fx, F.lit(0)), F.lit(n - 1)).cast("long") * n
        + F.least(F.greatest(fy, F.lit(0)), F.lit(n - 1)).cast("long")
    )
    day = (F.unix_timestamp(F.col("ts")) / F.lit(86400)).cast("long")
    pres = ev.select(
        tile.alias("tile"), day.alias("day"), F.col("user_id").alias("entity")
    ).distinct()
    other = pres.select(
        F.col("tile").alias("__t"), F.col("day").alias("__d"),
        F.col("entity").alias("__e"),
    )
    pairs = pres.join(
        other,
        (pres["tile"] == other["__t"]) & (pres["day"] == other["__d"])
        & (pres["entity"] < other["__e"]),
    ).select(F.col("entity").alias("a"), F.col("__e").alias("b"), "day")
    exp = _sorted_pdf(
        pairs.groupBy("a", "b")
        .agg(F.countDistinct("day").alias("n_codays"))
        .filter(F.col("n_codays") >= 3)
    )
    assert got.equals(exp) and len(got) > 0


def test_ivf_kernel_explicit_small_k_ties(spark):
    """Masked partial top-k must keep boundary ties per partition: a
    fixture where many corpus vectors tie on the dot product."""
    from langtoolsosm_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_join,
    )

    rows = []
    for i in range(120):
        # two distinct vector shapes -> massive dot-product ties
        base = [1.0] * 8 if i % 2 == 0 else [1.0] * 4 + [0.0] * 4
        rows.append((i, base))
    spark_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = spark_df.repartition(7)  # spread ties across partitions
    got = _sorted_pdf(ivf_ann_topk(df, k=3, n_centroids=4, nprobe=2))
    exp = _sorted_pdf(ivf_ann_topk_join(df, k=3, n_centroids=4, nprobe=2))
    assert got.equals(exp) and len(got) > 0


def test_pq_adc_kernel_matches_join(spark, emb):
    """Masked ADC corpus-pass PQ top-k == broadcast-join formulation."""
    from langtoolsosm_spark.operators.similarity import (
        pq_ann_topk,
        pq_ann_topk_join,
    )

    got = _sorted_pdf(pq_ann_topk(emb))
    exp = _sorted_pdf(pq_ann_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_pq_rescored_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        pq_ann_rescored,
        pq_ann_rescored_join,
    )

    got = _sorted_pdf(pq_ann_rescored(emb))
    exp = _sorted_pdf(pq_ann_rescored_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_sq8_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        sq8_ann_topk,
        sq8_ann_topk_join,
    )

    got = _sorted_pdf(sq8_ann_topk(emb))
    exp = _sorted_pdf(sq8_ann_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_ivf_pq_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        ivf_pq_ann_topk,
        ivf_pq_ann_topk_join,
    )

    got = _sorted_pdf(ivf_pq_ann_topk(emb))
    exp = _sorted_pdf(ivf_pq_ann_topk_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_ivf_pq_rescored_kernel_matches_join(spark, emb):
    from langtoolsosm_spark.operators.similarity import (
        ivf_pq_ann_rescored,
        ivf_pq_ann_rescored_join,
    )

    got = _sorted_pdf(ivf_pq_ann_rescored(emb))
    exp = _sorted_pdf(ivf_pq_ann_rescored_join(emb))
    assert got.equals(exp) and len(got) > 0


def test_pq_kernel_nondefault_geometry(spark, emb):
    """Parity off the default config (m=4 subspaces, 8 codes, 1 Lloyd
    iter; nprobe=3 over 8 coarse lists for the IVF composite) exercises
    the per-subspace book indexing and the probe mask off-path."""
    from langtoolsosm_spark.operators.similarity import (
        ivf_pq_ann_topk,
        ivf_pq_ann_topk_join,
        pq_ann_topk,
        pq_ann_topk_join,
    )

    kw = dict(m=4, k_codes=8, iters=1)
    got = _sorted_pdf(pq_ann_topk(emb, **kw))
    exp = _sorted_pdf(pq_ann_topk_join(emb, **kw))
    assert got.equals(exp) and len(got) > 0

    kw2 = dict(m=4, k_codes=8, iters=1, n_centroids=8, nprobe=3)
    got2 = _sorted_pdf(ivf_pq_ann_topk(emb, **kw2))
    exp2 = _sorted_pdf(ivf_pq_ann_topk_join(emb, **kw2))
    assert got2.equals(exp2) and len(got2) > 0


def test_pq_adc_kernel_sharded_queries(spark, emb):
    """Tiny shard_rows forces the multi-broadcast sharded query path of
    the ADC kernel — must be byte-identical to the single-shard answer."""
    from langtoolsosm_spark.operators.similarity import (
        _pq_adc_topk_kernel,
        _pq_artifacts,
        pq_ann_topk,
    )

    _sub, cents, _codes = _pq_artifacts(
        emb, 8, 16, 2, "vec_id", "embedding", need_codes=False
    )
    got = _sorted_pdf(
        _pq_adc_topk_kernel(emb, cents, 5, "vec_id", "embedding", shard_rows=3)
    )
    exp = _sorted_pdf(pq_ann_topk(emb))
    assert got.equals(exp) and len(got) > 0


def test_pq_train_kernel_matches_join(spark, emb):
    """Corpus-pass Lloyd training == the join/explode formulation, both
    at the default geometry and off it (odd k_codes exercises dropped
    codes / non-contiguous seed ids)."""
    from langtoolsosm_spark.operators.similarity import pq_train, pq_train_join

    def rows(df):
        return sorted(
            (r["s"], r["code"], list(r["__cv"])) for r in df.collect()
        )

    got = rows(pq_train(emb))
    exp = rows(pq_train_join(emb))
    assert got == exp and len(got) > 0

    got2 = rows(pq_train(emb, m=4, k_codes=7, iters=3))
    exp2 = rows(pq_train_join(emb, m=4, k_codes=7, iters=3))
    assert got2 == exp2 and len(got2) > 0


def test_ivf_train_lloyd_kernel_matches_join(spark, emb):
    """Corpus-pass IVF Lloyd training == the join/explode formulation
    (default and off-default geometry)."""
    from langtoolsosm_spark.operators.similarity import (
        ivf_train_lloyd,
        ivf_train_lloyd_join,
    )

    def rows(df):
        return sorted((r["centroid_id"], list(r["__cv"])) for r in df.collect())

    got = rows(ivf_train_lloyd(emb))
    exp = rows(ivf_train_lloyd_join(emb))
    assert got == exp and len(got) > 0

    got2 = rows(ivf_train_lloyd(emb, n_centroids=5, iters=3))
    exp2 = rows(ivf_train_lloyd_join(emb, n_centroids=5, iters=3))
    assert got2 == exp2 and len(got2) > 0


def test_range_ranked_matches_global_window(spark):
    """Two-pass range-partitioned rank == the single-task global window,
    on a fixture with heavy key duplication spread across partitions
    (ties broken by the unique id column)."""
    from pyspark.sql import Window

    from langtoolsosm_spark.operators.rank import range_ranked

    rows = [(i, (i * 7) % 13) for i in range(5_000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(11)
    got, n = range_ranked(df, ["v", "id"], "rank")
    exp = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    assert n == 5_000
    g = _sorted_pdf(got)
    e = _sorted_pdf(exp)
    assert g.equals(e)


def test_norm_audit_and_vocab_growth_rank_rewrite(spark):
    """The range_ranked rewrites must reproduce the operators' previous
    windowed output exactly (norm ties + empty-token docs included)."""
    from pyspark.sql import Window

    from langtoolsosm_spark.operators.similarity import embedding_norm_audit
    from langtoolsosm_spark.operators.textstats import vocab_growth

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = _sorted_pdf(embedding_norm_audit(emb))
    # inline pre-r8 reference: global window rank over (norm2_q, id)
    norm2 = F.aggregate(
        F.expr(
            "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000.0) AS BIGINT))"
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    scored = emb.select(F.col("vec_id").alias("id"), norm2.alias("norm2_q"))
    ranked = scored.withColumn(
        "rank", F.row_number().over(Window.orderBy("norm2_q", "id"))
    )
    n = ranked.count()
    lo = 10 * n // 1000
    hi = n - lo
    exp = _sorted_pdf(
        ranked.select(
            "id", "norm2_q", F.col("rank").cast("long"),
            F.lit(n).cast("long").alias("n"),
            F.when((F.col("rank") <= lo) | (F.col("rank") > hi), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("is_outlier"),
        )
    )
    assert got.equals(exp) and len(got) > 0

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "beta gamma delta"), (4, "42 !!"),
         (5, "delta alpha"), (6, "epsilon")],
        "doc_id long, text string",
    )
    vg = _sorted_pdf(vocab_growth(docs, steps=4))
    assert len(vg) == 4 and int(vg["vocab"].max()) == 5
