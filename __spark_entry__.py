"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline — HTML pages built from the
sf0.001 documents table, pushed through the real extraction UDF (readability
+ music-embed detection), aggregated per provider.  ``queries()`` /
``oracle_sql()`` expose the engine's operator catalog (SURVEY.md §2 +
training-data ops) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Python workers need the package importable too (driver may launch the
# session itself, without going through pink_spider_spark.session.get_spark)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> synthetic HTML -> extract UDF -> enclosures
    per provider with state split (alive vs dead = catalog miss)."""
    from pyspark.sql import functions as F

    from pink_spider_spark.functions.udfs import extract_pages
    from pink_spider_spark.queries import docs_to_pages

    pages, items = docs_to_pages(spark, "/root/testdata/sf0.001")
    extracted = extract_pages(pages, items)
    return (
        extracted.select(F.explode("enclosures").alias("e"))
        .groupBy(F.col("e.provider").alias("provider"), F.col("e.state").alias("state"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("provider", "state")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ dedup /
    similarity / text-analysis training-data operators).

    SCALE note: ``pink_spider_spark.queries.VERIFIER_ONLY`` marks the
    entries that exist only as small-scale correctness verifiers for a
    bucketed scale twin (deliberate all-pairs plans); it maps each to
    the production-path query to use at size."""
    from pink_spider_spark.queries import QUERY_BUILDERS

    return dict(QUERY_BUILDERS)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    stateful ops — e.g. crawl_two_waves — which get rows-only checks)."""
    from pink_spider_spark.queries import ORACLES

    return {name: sql for name, sql in ORACLES.items() if sql is not None}
