"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline ops: dedup, similarity search, text analysis);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL where expressible —
extraction / Spark-hash-specific ops are rows-only by design (their
byte-identity gate runs through pytest golden fixtures instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exstruct_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: run the fused extraction
    engine over the ``documents`` table (wrapped as HTML pages) and roll
    up per-lang extraction metrics.  Driver checks rows > 0."""
    from exstruct_spark.queries import q_extract_documents_flagship

    return q_extract_documents_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline ops)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same aliases as the Spark
    side).  Keys absent here are rows-only checks: extraction over the
    repo's own synthetic HTML corpus (byte-identity via pytest) and
    Spark-hash-specific dedup/LSH ops."""
    return dict(ORACLES)
