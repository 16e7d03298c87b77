#!/usr/bin/env python
"""Production entry point for the extraction job.

Cluster usage (the BASELINE.json deployment shape)::

    zip -r exstruct_spark.zip exstruct_spark/
    spark-submit \
      --py-files exstruct_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=4096 \
      jobs/run_extraction.py \
      --input  <iceberg-table-or-parquet-path> \
      --output  s3://.../extractions \
      --lineage s3://.../lineage \
      --metrics s3://.../metrics \
      --buckets 4096

At 10^12 docs set ``--buckets`` so one bucket is a few GB of output
(resume granularity = one bucket).  Rerunning the same command after a
partial failure resumes: completed buckets are anti-joined away.

Local smoke::

    python jobs/run_extraction.py --synthetic 2000 --output /tmp/x \
      --lineage /tmp/x_lin --metrics /tmp/x_met
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="exstruct-spark extraction job")
    ap.add_argument("--input", help="pages table path (parquet dir) or Iceberg table name")
    ap.add_argument("--format", default="parquet",
                    help="input source format: parquet (default) or iceberg "
                         "(requires the iceberg-spark-runtime jar + catalog "
                         "conf on the cluster; --input is then a table name)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--wave-size", type=int, default=16,
                    help="buckets per checkpoint commit (resume granularity)")
    ap.add_argument("--snapshot", default=None,
                    help="input snapshot name keying lineage + output "
                         "partitions (default: derived from the input)")
    ap.add_argument("--staging", default=None,
                    help="staging dir for the bucketed input (default: "
                         "<output>.staging)")
    ap.add_argument("--no-stage-input", action="store_true",
                    help="skip input staging: waves filter the input "
                         "directly (use when the source is already "
                         "partition-pruned on the bucket key or cheap to "
                         "re-scan)")
    ap.add_argument("--external-css", action="store_true",
                    help="resolve <link rel=stylesheet> against the "
                         "corpus's own CSS documents (pages-joins-sheets "
                         "broadcast equi-join) BEFORE staging, so "
                         "class-styled tables detect like inline ones")
    ap.add_argument("--master", default=None,
                    help="override master (default: whatever spark-submit set)")
    ap.add_argument("--export-yaml", default=None, metavar="DIR",
                    help="after the run, export the output table's core "
                         "columns as a multi-document YAML stream (the "
                         "reference's save_as_yaml analogue; export-only "
                         "dialect behind TableIO('yaml'))")
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("one of --input / --synthetic is required")

    from pyspark.sql import SparkSession

    from exstruct_spark.engine import ExtractionJob, default_session
    from exstruct_spark.pages import spark_pages

    if args.master:
        spark = default_session(app="exstruct-extract", master=args.master)
    else:
        spark = SparkSession.builder.appName("exstruct-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        pages = spark_pages(spark, args.synthetic)
        snapshot = f"synthetic:{args.synthetic}"
    elif args.format == "iceberg":
        # Iceberg scans give snapshot isolation + partition pruning; the
        # rest of the pipeline is format-agnostic
        pages = spark.read.format("iceberg").load(args.input)
        snapshot = f"iceberg:{args.input}"
    else:
        pages = spark.read.parquet(args.input)
        snapshot = args.input

    if args.external_css:
        from exstruct_spark.engine import attach_external_css

        pages = attach_external_css(pages)

    job = ExtractionJob(
        spark,
        output_dir=args.output,
        lineage_dir=args.lineage,
        metrics_dir=args.metrics,
        n_buckets=args.buckets,
        staging_dir=args.staging,
    )
    summary = job.run(
        pages,
        input_snapshot=args.snapshot or snapshot,
        wave_size=args.wave_size,
        stage_input=not args.no_stage_input,
    )
    if args.export_yaml:
        from pyspark.sql import functions as F

        from exstruct_spark.engine import TableIO

        out_df = spark.read.parquet(args.output).select(
            "url", "status", "main_text", "extraction_json", "url_bucket"
        )
        TableIO("yaml").write(
            out_df, args.export_yaml, "overwrite",
            partition_by=("url_bucket",),
        )
        summary["yaml_export_dir"] = args.export_yaml
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
