"""Round-7 second-session operator units: Markov predictability,
co-location lift, spatial k-fold, CMS heavy hitters, semivariogram,
cell compaction, dissolve perimeter, orientation histograms."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "epoch", "event_id", "lat", "lon"])
    return spark.createDataFrame(pdf).select(
        "user_id",
        F.timestamp_seconds("epoch").alias("ts"),
        "event_id", "lat", "lon",
    )


def test_tile_predictability_modal_and_tiebreak(spark):
    from langtoolsosm_spark.functions.cells import tile_key
    from langtoolsosm_spark.operators.spatial import tile_predictability

    def t(lat, lon):
        return int(tile_key(np.array([lat]), np.array([lon]), 6)[0])

    a, b, c = (10.0, 10.0), (40.0, 40.0), (-40.0, -40.0)
    # user 1: A->B twice, A->C once; user 2: A->C once (tie 2-2 broken
    # to the smaller tile id)
    rows = [
        (1, 0, 0, *a), (1, 1, 1, *b), (1, 2, 2, *a), (1, 3, 3, *b),
        (1, 4, 4, *a), (1, 5, 5, *c),
        (2, 0, 6, *a), (2, 1, 7, *c),
    ]
    out = {r["from_tile"]: r for r in
           tile_predictability(_ev(spark, rows), "user_id", "ts", res=6,
                               order_tiebreak="event_id").collect()}
    ta, tb, tc = t(*a), t(*b), t(*c)
    row = out[ta]
    # counts: A->B 2, A->C 2 -> tie, smaller tile id wins
    assert row["top_to_tile"] == min(tb, tc)
    assert row["top_n"] == 2 and row["total_n"] == 4 and row["n_dest"] == 2
    # B->A occurs twice (user 1 returns to A after each B visit)
    assert out[tb]["top_to_tile"] == ta and out[tb]["total_n"] == 2
