"""HLL sketch properties (mergeability, accuracy bound) and as-of join
semantics (tolerance, tie handling)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.operators.asof import asof_join
from langtoolsosm_spark.operators.sketches import (
    M,
    estimate_from_registers,
    hll_estimate,
    hll_registers,
)


def _dense(regs_pdf):
    import numpy as np

    d = np.zeros(M, dtype=np.int64)
    d[regs_pdf["register"].to_numpy()] = regs_pdf["max_rho"].to_numpy()
    return d


def test_hll_registers_merge_equals_whole(spark):
    df = spark.range(0, 3000).select((F.col("id") % 997).alias("v"))
    whole = _dense(hll_registers(df, "v").toPandas())
    a = _dense(hll_registers(df.filter(F.col("id") < 1500), "v").toPandas())
    b = _dense(hll_registers(df.filter(F.col("id") >= 1500), "v").toPandas())
    import numpy as np

    assert (np.maximum(a, b) == whole).all()
    assert estimate_from_registers(np.maximum(a, b)) == estimate_from_registers(whole)


def test_hll_estimate_within_bound(spark):
    # true distinct 997; m=256 -> standard error ~1.04/sqrt(256) = 6.5%
    df = spark.range(0, 5000).select((F.col("id") % 997).alias("v"))
    row = hll_estimate(df, "v").collect()[0]
    est = row["est_milli"] / 1000.0
    assert abs(est - 997) / 997 < 0.2  # 3 sigma
    assert row["m"] == M


def test_asof_tolerance_and_ties(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "ts": [10, 100, 5], "tag": ["x", "y", "z"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [5, 50], "value": [1.0, 2.0]})
    )
    out = asof_join(left, right, ["k"], left_ts="ts", right_ts="ts", tolerance=20)
    rows = {r["tag"]: (r["__matched_ts"], r["matched_value"]) for r in out.collect()}
    # same-instant right row matches (backward as-of is inclusive)
    assert rows["z"] == (5, 1.0)
    assert rows["x"] == (5, 1.0)
    # ts=100: latest right is ts=50, but 100 - 50 > 20 -> tolerance nulls it
    assert rows["y"] == (None, None)
    assert out.count() == 3
