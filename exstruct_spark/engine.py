"""Spark job layer: the fused extraction stage + scale machinery.

Design (SURVEY.md §7.1): one scan -> ``repartition(N, xxhash64(url))`` ->
ONE fused ``mapInPandas`` stage (all artifact families from one DOM parse,
JSON serialized in-kernel) -> output + per-partition metrics + lineage
checkpoint.  Zero per-row Python UDFs; the only Python/JVM crossings are
Arrow batches.

Scale notes (100 TB / 10^12 docs):
  * extraction is embarrassingly parallel — the ONLY shuffle in the hot
    path is the explicit url-hash repartition, which exists to (a) bound
    task size regardless of upstream file layout and (b) define the
    bucket key for checkpoint resume.  When the source is already well
    partitioned, pass ``repartition_to=None`` to elide the shuffle.
  * skewed hosts don't matter here because the partition key is the full
    url hash (uniform); host-level *aggregations* (see metrics queries)
    salt with ``pmod(xxhash64(url), SALT_BUCKETS)``.
  * Arrow batch size bounds per-batch DOM memory
    (``spark.sql.execution.arrow.maxRecordsPerBatch``).
  * fallback-not-fail: a bad document degrades row-locally; the job
    never dies (reference core/pipeline.py:1097-1193 behaviour).
"""

from __future__ import annotations

import time
import uuid
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exstruct_spark.config import ExtractOptions
from exstruct_spark.golden import EXTRACT_SCHEMA_DDL, extract_pdf

EXTRACT_WITH_PARTITION_DDL = (
    EXTRACT_SCHEMA_DDL + ", partition_id int, batch_wall_ms bigint"
)

METRICS_SCHEMA_DDL = (
    "run_id string, partition_id int, docs bigint, bytes_in bigint, "
    "ok bigint, fallback bigint, truncated bigint, wall_ms bigint"
)

LINEAGE_SCHEMA_DDL = (
    "run_id string, url_bucket int, input_snapshot string, "
    "code_version string, status string, completed_at timestamp"
)


def default_session(
    app: str = "exstruct-spark",
    master: str = "local[32]",
    shuffle_partitions: int = 32,
    arrow_batch: int = 2048,
) -> SparkSession:
    """Session tuned for the extraction workload.

    AQE on (runtime re-plan / skew joins), Arrow enabled, UTC session TZ
    (timestamp determinism vs DuckDB oracle), bounded Arrow batches (memory
    control for adversarial HTML — SURVEY.md §7.4 hard-part 4).
    """
    return (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def extract_stage(
    pages: DataFrame,
    opts: ExtractOptions = ExtractOptions(),
    repartition_to: Optional[int] = None,
) -> DataFrame:
    """The fused extraction transform: pages df -> extraction df.

    ``repartition_to``: explicit url-hash repartition width (None = keep
    upstream partitioning — no shuffle).  Each batch records its task
    partition id + wall time so metrics are derivable with one cheap
    aggregation downstream (SURVEY.md §2.4 A7 — lineage as first-class).
    """
    df = pages
    if repartition_to:
        df = df.repartition(repartition_to, F.xxhash64("url"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            t0 = time.monotonic()
            out = extract_pdf(pdf, opts)
            wall_ms = int((time.monotonic() - t0) * 1000)
            out["partition_id"] = pid
            out["batch_wall_ms"] = wall_ms
            yield out

    return df.select("url", "html").mapInPandas(run, schema=EXTRACT_WITH_PARTITION_DDL)


def metrics_from_extracted(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition extraction metrics (FIXTURES.md §3 contract).

    One narrow groupBy on the small extracted projection — partial
    (map-side) aggregation makes this shuffle negligible at any scale.
    """
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("fallback"),
            F.sum(F.when(F.col("truncated"), 1).otherwise(0)).alias("truncated"),
            F.max("batch_wall_ms").alias("wall_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "docs",
            "bytes_in",
            "ok",
            "fallback",
            "truncated",
            "wall_ms",
        )
    )


class ExtractionJob:
    """Checkpoint-resumable extraction run over a pages table.

    Resume semantics (SURVEY.md §7.4 hard-part 5): the unit of completion
    is a url-hash *bucket* (``pmod(xxhash64(url), n_buckets)``).  A
    lineage table records ``status='done'`` per bucket; a restarted run
    LEFT ANTI JOINs inputs against done buckets, so partially completed
    crawls never recompute finished work, and per-bucket output overwrite
    keeps the sink idempotent (dynamic partition overwrite).

    Resume assumes a FIXED input snapshot (``input_snapshot`` names it):
    a bucket marked done is done for that snapshot.  A new crawl snapshot
    gets a fresh lineage dir (or equivalently a new output root) — the
    Iceberg-snapshot-per-crawl deployment shape.
    """

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str,
        lineage_dir: str,
        metrics_dir: str,
        n_buckets: int = 64,
        opts: ExtractOptions = ExtractOptions(),
        code_version: str = "0.1.0",
    ):
        self.spark = spark
        self.output_dir = output_dir
        self.lineage_dir = lineage_dir
        self.metrics_dir = metrics_dir
        self.n_buckets = n_buckets
        self.opts = opts
        self.code_version = code_version

    def _done_buckets(self) -> DataFrame:
        try:
            lineage = self.spark.read.parquet(self.lineage_dir)
        except Exception:
            return self.spark.createDataFrame([], "url_bucket int")
        return lineage.where(F.col("status") == "done").select("url_bucket").distinct()

    def _bucketed(self, pages: DataFrame) -> DataFrame:
        return pages.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int")
        )

    def _run_wave(
        self, bucketed: DataFrame, wave_buckets: list, run_id: str,
        input_snapshot: str,
    ) -> None:
        """Process one wave of buckets END-TO-END: extract -> write output
        partitions -> write metrics -> append lineage.  Lineage lands only
        after the wave's output is durable, so a crash between waves loses
        at most one wave of work (incremental checkpointing — a whole-run
        lineage commit would resume from zero after a mid-job failure)."""
        todo = bucketed.where(F.col("url_bucket").isin(wave_buckets))
        extracted = extract_stage(todo, self.opts).withColumn(
            # bucket id re-derived from url: pure column function, no join
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int")
        )
        (
            extracted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("url_bucket")
            .parquet(self.output_dir)
        )
        wave_out = self.spark.read.parquet(self.output_dir).where(
            F.col("url_bucket").isin(wave_buckets)
        )
        metrics_from_extracted(wave_out, run_id).write.mode("append").parquet(
            self.metrics_dir
        )
        done_rows = [
            (run_id, int(b), input_snapshot, self.code_version, "done")
            for b in wave_buckets
        ]
        (
            self.spark.createDataFrame(
                done_rows,
                "run_id string, url_bucket int, input_snapshot string, "
                "code_version string, status string",
            )
            .withColumn("completed_at", F.current_timestamp())
            .write.mode("append")
            .parquet(self.lineage_dir)
        )

    def run(
        self,
        pages: DataFrame,
        input_snapshot: str = "static",
        wave_size: int = 16,
        max_waves: Optional[int] = None,
    ) -> dict:
        """Execute (or resume) an extraction run in waves of buckets.

        ``wave_size``: buckets per checkpoint commit (resume granularity).
        ``max_waves``: stop early after N waves (testing/chunked runs).
        Returns a summary dict."""
        run_id = uuid.uuid4().hex[:12]
        bucketed = self._bucketed(pages)
        done_pdf = self._done_buckets().toPandas()
        n_done_before = len(done_pdf)
        done_set = set(done_pdf["url_bucket"].tolist())
        # only buckets that actually have input rows (cheap distinct)
        present = sorted(
            r["url_bucket"]
            for r in bucketed.select("url_bucket").distinct().collect()
        )
        todo_buckets = [b for b in present if b not in done_set]

        waves = [
            todo_buckets[i : i + wave_size]
            for i in range(0, len(todo_buckets), wave_size)
        ]
        if max_waves is not None:
            waves = waves[:max_waves]
        for wave in waves:
            self._run_wave(bucketed, wave, run_id, input_snapshot)

        try:
            n_out = self.spark.read.parquet(self.output_dir).count()
        except Exception:
            n_out = 0
        return {
            "run_id": run_id,
            "buckets_done_before": n_done_before,
            "buckets_processed": sum(len(w) for w in waves),
            "waves": len(waves),
            "rows_in_output": n_out,
        }
