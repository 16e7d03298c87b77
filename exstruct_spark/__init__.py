"""exstruct_spark — a brand-new PySpark-native structured-content extraction engine.

Transplants the extraction philosophy of harumiWeb/exstruct (document ->
sparse cell rows + scored table candidates + shape/arrow graph + chart
series -> compact structured JSON; see /root/reference, BSD-3-Clause) onto
Common-Crawl-style web pages stored as an Iceberg/parquet table of
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Architecture (SURVEY.md §7.1): one scan -> one fused ``mapInPandas``
extraction stage per Arrow batch (parse HTML once, emit every artifact
family), url-hash partitioning, per-partition metrics/lineage, checkpoint
resume.  Zero per-row Python UDFs — all Python executes on Arrow batches.

This is NOT a port: no code is copied from the reference.  Docstrings cite
reference files (file:line) only to document behavioural parity.
"""

from exstruct_spark.config import DetectionConfig, ExtractOptions
from exstruct_spark.kernels.extract import extract_document, normalize_url
from exstruct_spark.golden import reference_extract_frame

__version__ = "0.2.0"

__all__ = [
    "DetectionConfig",
    "ExtractOptions",
    "extract_document",
    "normalize_url",
    "reference_extract_frame",
    "__version__",
]


def __getattr__(name):
    # Spark-dependent surfaces resolve lazily so the pure kernels stay
    # importable without a JVM (golden fixtures, unit tests, tooling)
    if name in ("ExtractionJob", "extract_stage", "default_session",
                "metrics_from_extracted"):
        from exstruct_spark import engine

        return getattr(engine, name)
    if name in ("stream_extract_available_now", "stream_sessionize",
                "stream_windowed_counts"):
        from exstruct_spark import streaming

        return getattr(streaming, name)
    if name in ("QUERIES", "ORACLES"):
        from exstruct_spark import queries

        return getattr(queries, name)
    raise AttributeError(name)
