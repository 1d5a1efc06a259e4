"""Round-7 regression pins: ANN recall floors on the clustered fixture
(VERDICT r6 item 2), bench headline family freeze (item 1), and the
round-7 ADVICE guards."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# VERDICT item 2: recall floors on the clustered (mixture-of-Gaussians)
# fixture. The driver's uniform-sphere embeddings are the information-
# theoretic worst case for quantized ANN, so PQ/IVF-PQ recall there
# carries no regression signal; the clustered fixture is deterministic
# (datagen seed), so a drop below these floors is a real code regression,
# not noise. Measured round-7 values at the sf0.01 fixture (500 rows):
# lsh 0.98, ivf 0.90, ivf_lloyd 0.98, pq_adc 0.38, pq_rescored 0.82,
# sq8 0.98, ivf_pq 0.38, ivf_pq_rescored 0.82.
# ---------------------------------------------------------------------------

RECALL_FLOORS = {
    "lsh_kernel": 0.90,
    "ivf": 0.80,
    "ivf_lloyd": 0.90,
    "pq_adc": 0.30,       # raw 32-bit ADC ceiling — floor pins the ceiling
    "pq_rescored": 0.80,
    "sq8": 0.90,
    "ivf_pq": 0.30,       # same ADC ceiling; probing must not LOSE recall
    "ivf_pq_rescored": 0.80,
}


@pytest.fixture(scope="module")
def clustered_recalls(spark):
    from langtoolsosm_spark.datagen import ensure_clustered_embeddings
    from langtoolsosm_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_ann_topk,
        ivf_lloyd_ann_topk,
        ivf_pq_ann_rescored,
        ivf_pq_ann_topk,
        pq_ann_rescored,
        pq_ann_topk,
        sq8_ann_topk,
        topk_dot_kernel,
    )

    emb = spark.read.parquet(ensure_clustered_embeddings("sf0.01"))
    exact = topk_dot_kernel(emb).select("query_id", "neighbor_id").persist()
    n_true = exact.count()

    def recall(approx):
        hit = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"], "left_semi",
        ).count()
        return hit / n_true

    out = {
        "lsh_kernel": recall(ann_lsh_topk(emb, kernel_buckets=True)),
        "ivf": recall(ivf_ann_topk(emb)),
        "ivf_lloyd": recall(ivf_lloyd_ann_topk(emb)),
        "pq_adc": recall(pq_ann_topk(emb)),
        "pq_rescored": recall(pq_ann_rescored(emb)),
        "sq8": recall(sq8_ann_topk(emb)),
        "ivf_pq": recall(ivf_pq_ann_topk(emb)),
        "ivf_pq_rescored": recall(ivf_pq_ann_rescored(emb)),
    }
    exact.unpersist()
    return out


@pytest.mark.parametrize("family", sorted(RECALL_FLOORS))
def test_clustered_recall_floor(clustered_recalls, family):
    assert clustered_recalls[family] >= RECALL_FLOORS[family], (
        f"{family} recall@5 {clustered_recalls[family]:.3f} fell below the "
        f"clustered-fixture floor {RECALL_FLOORS[family]}"
    )


def test_rescoring_never_hurts(clustered_recalls):
    """The two-stage variants must dominate their raw-ADC counterparts —
    the property rescoring exists to buy."""
    assert clustered_recalls["pq_rescored"] >= clustered_recalls["pq_adc"]
    assert (
        clustered_recalls["ivf_pq_rescored"] >= clustered_recalls["ivf_pq"]
    )


def test_clustered_fixture_deterministic():
    """Same seed -> byte-identical fixture (the floor test is only a
    regression pin if the data cannot drift)."""
    from langtoolsosm_spark.datagen import synth_clustered_embeddings

    a = synth_clustered_embeddings(n=64)
    b = synth_clustered_embeddings(n=64)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert all(
        np.array_equal(x, y) for x, y in zip(a["embedding"], b["embedding"])
    )
    # unit-norm contract
    norms = np.array([np.linalg.norm(v) for v in a["embedding"]])
    assert np.allclose(norms, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# VERDICT item 1: the headline ANN family list is frozen — its members
# must all be timed, and no post-round-5 family may appear in it.
# ---------------------------------------------------------------------------


def test_headline_ann_family_frozen():
    import bench

    assert bench.HEADLINE_ANN == ("exact_baseline", "lsh_kernel", "ivf", "ivf_lloyd")
    assert set(bench.EXT_ANN) & set(bench.HEADLINE_ANN) == set()
    for fam in ("pq_adc", "pq_rescored", "sq8", "ivf_pq"):
        assert fam in bench.EXT_ANN


# ---------------------------------------------------------------------------
# VERDICT item 3: co_visitation hardening — occupancy gate + no dedup
# exchange on the occupancy^2 frame.
# ---------------------------------------------------------------------------


def _covis_events(spark):
    # 3 users co-located across 2 days in a quiet tile, plus an 8-entity
    # "stadium day" in another tile
    rows = []
    for day in (0, 1):
        for u in ("a", "b", "c"):
            rows.append((u, day * 86400 + 10, 10.0, 10.0))
    for i in range(8):
        rows.append((f"crowd{i}", 5 * 86400 + 10, -40.0, -40.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "epoch", "lat", "lon"])
    return spark.createDataFrame(pdf).select(
        "user_id", F.timestamp_seconds("epoch").alias("ts"), "lat", "lon"
    )


def test_co_visitation_occupancy_gate_fires(spark):
    from langtoolsosm_spark.operators.tiling import co_visitation

    ev = _covis_events(spark)
    with pytest.raises(ValueError, match="max_occupancy"):
        co_visitation(ev, res=5, min_days=2, max_occupancy=5)


def test_co_visitation_capped_consistent(spark):
    """With the gate satisfied, the result on the quiet portion is the
    same whether or not the hot venue-day rows are present after
    pre-thinning them away — and the gate default passes the fixture."""
    from langtoolsosm_spark.operators.tiling import co_visitation

    ev = _covis_events(spark)
    full = co_visitation(ev, res=5, min_days=2)  # default cap 10k: passes
    got = {(r["a"], r["b"], r["n_codays"]) for r in full.collect()}
    assert got == {("a", "b", 2), ("a", "c", 2), ("b", "c", 2)}

    thinned = ev.filter(~F.col("user_id").startswith("crowd"))
    quiet = co_visitation(thinned, res=5, min_days=2, max_occupancy=5)
    assert {(r["a"], r["b"], r["n_codays"]) for r in quiet.collect()} == got


def test_co_visitation_no_pair_dedup_exchange(spark):
    """The within-(tile, day) join of a distinct presence set cannot
    duplicate, so the (a, b, tile, day) dedup aggregate that used to sit
    on the occupancy^2 pair frame (the largest intermediate) must be
    gone: no aggregate keyed on (a, b, tile, ...) anywhere in the plan.
    (A raw Exchange count is NOT asserted — AQE's plan dump repeats
    initial plans, making the count run-order-dependent.)"""
    import re

    from langtoolsosm_spark.operators.tiling import co_visitation

    df = co_visitation(
        _covis_events(spark), res=5, min_days=2, max_occupancy=None
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"keys=\[a#\d+, b#\d+, tile#", plan), plan
