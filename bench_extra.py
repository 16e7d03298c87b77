#!/usr/bin/env python
"""Supplementary benchmark (guide §1.4): noop-sink isolation, best-of-N.

NOT the driver contract — ``bench.py`` stays the frozen measurement.
This harness exists for optimization-round evidence
(OPTIMIZATION_r08.md): it times each bench query best-of-N with the
noop sink and labels every job (guide §1.5), so per-query numbers are
separated from one-shot scheduler noise.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py [N]
Prints one JSON line: {"queries_best": {...}, "extract_best": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from exstruct_spark.engine import default_session, extract_stage  # noqa: E402
from exstruct_spark.pages import spark_pages  # noqa: E402
from exstruct_spark.queries import QUERIES, RETIRED_QUERIES  # noqa: E402

_LOOKUP = {**QUERIES, **RETIRED_QUERIES}

BENCH_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5_region", "tpch_q6", "events_hourly",
    "events_gap_lag", "doc_quality", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "ann_cosine_topk", "docs_by_source_salted",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))

    spark = default_session(
        app="exstruct-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus, arrow_batch=4096,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # extraction: same corpus + partitioning discipline as bench.py
    pages_path = f"/tmp/exstruct_bench_pages_{n_docs}"
    if not os.path.exists(pages_path):
        spark_pages(spark, n_docs, partitions=cpus * 2).write.mode(
            "overwrite").parquet(pages_path)
    pages_on_disk = spark.read.parquet(pages_path)
    sc.setJobDescription("extract: warm-up")
    extract_stage(pages_on_disk.limit(cpus * 64), repartition_to=cpus * 2).count()

    extract_best = None
    for i in range(n_rep):
        sc.setJobDescription(f"extract: pass {i}")
        t0 = time.monotonic()
        n_ok = (
            extract_stage(pages_on_disk, repartition_to=cpus * 2)
            .where(F.col("status").isNotNull()).count()
        )
        dt = time.monotonic() - t0
        extract_best = dt if extract_best is None else min(extract_best, dt)
    sc.setJobDescription(None)

    best: dict = {}
    for name in BENCH_QUERIES:
        fn = _LOOKUP[name]
        times = []
        for i in range(n_rep):
            sc.setJobDescription(f"{name}: pass {i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        best[name] = min(times)
    sc.setJobDescription(None)

    print(json.dumps({
        "queries_best": best,
        "queries_best_total": round(sum(best.values()), 3),
        "extract_best": round(extract_best, 3),
        "extract_docs_per_sec": round(n_ok / extract_best, 1),
        "repeats": n_rep,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
