"""Structured-Streaming execution of the extraction pipeline.

The reference is strictly batch per workbook (SURVEY.md §2.10); our
streaming form runs the SAME fused extraction transform over an
incrementally-discovered source with ``Trigger.AvailableNow`` — the
Iceberg-incremental-read pattern: each trigger drains all files not yet
recorded in the stream checkpoint, so a crawl that keeps landing new
page files is processed exactly once per file with no recomputation
(complementing the bucket-level ``ExtractionJob`` resume).

Extraction is stateless per row, so no watermarks/state stores are
needed; late data is N/A under snapshot/file semantics.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from exstruct_spark.config import ExtractOptions
from exstruct_spark.engine import extract_stage
from exstruct_spark.pages import PAGES_SCHEMA_DDL


def stream_extract_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    opts: ExtractOptions = ExtractOptions(),
    input_schema: str = PAGES_SCHEMA_DDL,
) -> None:
    """Drain all currently-available page files through the extraction
    stage, exactly once per file, then stop.  Blocking."""
    pages = (
        spark.readStream.schema(input_schema).parquet(input_dir)
    )
    extracted = extract_stage(pages, opts)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
