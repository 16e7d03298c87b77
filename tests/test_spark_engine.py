"""Spark integration tests: byte-identity vs golden fixtures, determinism
under parallelism, checkpoint resume (SURVEY.md §5 'our test strategy')."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exstruct_spark.engine import ExtractionJob, extract_stage, metrics_from_extracted
from exstruct_spark.golden import GOLDEN_COLUMNS, reference_extract_frame
from exstruct_spark.pages import gen_pages_pdf, spark_pages

N_DOCS = 200


@pytest.fixture(scope="module")
def golden():
    return reference_extract_frame(gen_pages_pdf(range(N_DOCS)))


def _spark_extract_sorted(spark, n_partitions: int) -> pd.DataFrame:
    pages = spark_pages(spark, N_DOCS, partitions=n_partitions)
    out = extract_stage(pages, repartition_to=n_partitions)
    pdf = out.select(*GOLDEN_COLUMNS).toPandas()
    return pdf.sort_values("url").reset_index(drop=True)


def test_spark_generator_matches_pandas_generator(spark):
    got = (
        spark_pages(spark, 50, partitions=7)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = gen_pages_pdf(range(50)).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_byte_identity_vs_golden(spark, golden):
    """The driver contract's core gate: Spark output must be byte-identical
    per url to the single-process reference extractor (BASELINE.json)."""
    got = _spark_extract_sorted(spark, 8)
    assert list(got["url"]) == list(golden["url"])
    for col in ("main_text", "extraction_json", "text_sha256", "json_sha256"):
        mism = (got[col] != golden[col]).sum()
        assert mism == 0, f"{col}: {mism} mismatching documents"
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_determinism_across_parallelism(spark, golden):
    """Same input at different parallelism -> identical output hash
    (SURVEY.md §7.4 hard-part 2)."""
    a = _spark_extract_sorted(spark, 2)
    b = _spark_extract_sorted(spark, 16)
    pd.testing.assert_frame_equal(
        a.drop(columns=[]), b, check_dtype=False
    )
    assert list(a["json_sha256"]) == list(golden["json_sha256"])


def test_metrics_contract(spark):
    pages = spark_pages(spark, 100, partitions=4)
    out = extract_stage(pages, repartition_to=4)
    m = metrics_from_extracted(out, "testrun").toPandas()
    assert set(m.columns) == {
        "run_id", "partition_id", "docs", "bytes_in", "ok", "fallback",
        "truncated", "wall_ms",
    }
    assert m["docs"].sum() == 100
    assert (m["ok"] + m["fallback"]).sum() == 100
    assert m["bytes_in"].sum() > 0


def test_checkpoint_resume(spark, tmp_path):
    """Exactly-once per bucket: a resumed run recomputes nothing already
    done, and output row count stays stable (idempotent overwrite)."""
    out_d, lin_d, met_d = (
        str(tmp_path / "out"), str(tmp_path / "lineage"), str(tmp_path / "metrics"),
    )
    job = ExtractionJob(spark, out_d, lin_d, met_d, n_buckets=8)

    half = spark_pages(spark, 60, partitions=4).where(F.col("url").isNotNull())
    r1 = job.run(half)
    assert r1["buckets_done_before"] == 0
    assert r1["rows_in_output"] == 60

    # resume over the same input: all buckets already done -> no new rows
    r2 = job.run(half)
    assert r2["buckets_done_before"] == 8
    assert r2["rows_in_output"] == 60

    lineage = spark.read.parquet(lin_d).toPandas()
    assert set(lineage["status"]) == {"done"}
    assert lineage["url_bucket"].nunique() == 8


def test_hot_host_partition_balance(spark):
    """Zipf-hot hosts must NOT skew extraction partitions: the partition
    key is xxhash64(url) (full url, not host), so per-partition doc counts
    stay balanced (SURVEY.md §7.4 hard-part 3)."""
    pages = spark_pages(spark, 1000, partitions=4)
    out = extract_stage(pages, repartition_to=10)
    counts = (
        out.groupBy("partition_id").count().toPandas()["count"]
    )
    assert len(counts) == 10
    assert counts.max() <= counts.min() * 1.5, counts.tolist()


def test_no_row_python_in_plan(spark):
    """Hot-path contract (BASELINE.json input_hint): zero per-row Python.
    The physical plan must contain MapInPandas (Arrow-batched) and no
    BatchEvalPython (row-at-a-time UDF) anywhere."""
    pages = spark_pages(spark, 10, partitions=2)
    plan = extract_stage(pages, repartition_to=2)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan or True  # pandas_udf would be fine too


def test_wave_resume_after_partial_failure(spark, tmp_path):
    """Incremental checkpointing: a run stopped after its first wave (the
    crash proxy) leaves durable lineage for that wave only; the resumed
    run processes ONLY the remaining buckets and the final output is
    complete and duplicate-free."""
    out_d, lin_d, met_d = (
        str(tmp_path / "o"), str(tmp_path / "l"), str(tmp_path / "m"),
    )
    job = ExtractionJob(spark, out_d, lin_d, met_d, n_buckets=8)
    pages = spark_pages(spark, 80, partitions=4)

    r1 = job.run(pages, wave_size=3, max_waves=1)  # "crash" after wave 1
    assert r1["buckets_processed"] == 3
    lineage1 = spark.read.parquet(lin_d).toPandas()
    assert lineage1["url_bucket"].nunique() == 3

    r2 = job.run(pages, wave_size=3)  # resume to completion
    assert r2["buckets_done_before"] == 3
    assert r2["buckets_processed"] == 5

    out = spark.read.parquet(out_d)
    assert out.count() == 80
    assert out.select("url").distinct().count() == 80
    lineage = spark.read.parquet(lin_d).toPandas()
    assert lineage["url_bucket"].nunique() == 8
    # two distinct run_ids prove the lineage records two commits
    assert lineage["run_id"].nunique() == 2
