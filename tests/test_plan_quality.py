"""Physical-plan assertions: pushdown, pruning, broadcast, codegen
(SURVEY.md §4 — "the plan you'd want, not the first one that passed")."""

from pyspark.sql import functions as F

from langtoolsosm_spark.operators.pip_join import bbox_filter
from langtoolsosm_spark.operators.tiling import assign_tiles
from langtoolsosm_spark.plans.pipeline import flagship


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bbox_filter_pushed_to_parquet(spark, synth_dir):
    images = spark.read.parquet(f"{synth_dir}/images.parquet")
    q = bbox_filter(images.select("image_id", "lat", "lon"), 40.0, 0.0, 43.0, 5.0)
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat,40.0)" in plan


def test_column_pruning_excludes_bytes(spark, synth_dir):
    """The flagship never touches pixels: the scan must not read bytes."""
    df = flagship(spark, synth_dir, res=8, with_knn=False)
    plan = _formatted(df)
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    assert not any("bytes" in l for l in read_schemas)


def test_tile_assign_is_codegen_not_udf(spark, synth_dir):
    images = spark.read.parquet(f"{synth_dir}/images.parquet")
    tiled = assign_tiles(images.select("image_id", "lat", "lon"), res=8)
    plan = _plan(tiled)
    # "*(n)" prefixes mark WholeStageCodegen stages in executedPlan toString
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_polygon_dim_joins_are_broadcast(spark, synth_dir):
    df = flagship(spark, synth_dir, res=8, with_knn=False)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the fact-side PIP candidate join must not sort-merge the small cover
    assert plan.count("SortMergeJoin") == 0
