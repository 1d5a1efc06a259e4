"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship geospatial pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (registry in langtoolsosm_spark/plans/driver_queries.py) for
the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tile assignment + PIP
    ownership + kNN caption enrichment over the synthetic image table."""
    from langtoolsosm_spark.datagen import ensure_dataset
    from langtoolsosm_spark.plans.pipeline import flagship

    synth = ensure_dataset("sf0.001")
    return flagship(spark, synth, res=8, k=1, with_knn=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from langtoolsosm_spark.plans.driver_queries import REGISTRY

    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops -> driver records the weaker rows-only check)."""
    from langtoolsosm_spark.plans.driver_queries import REGISTRY

    return {
        name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None
    }
