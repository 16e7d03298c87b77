#!/usr/bin/env python
"""Round-5 1M-doc soak (VERDICT r4 #9): ExtractionJob in STAGED mode
over a corpus that carries a media binary column, exactly-once verified,
with fallback accounting checked against the archetype construction.

Stages measured separately:
  1. staged extraction run — 1M docs, 256 buckets, waves of 64,
     local[32]; the staged table carries (url, warc_ts, html, text,
     lang, archetype, media);
  2. media metadata pass — media_meta_stage over the staged table's
     media column (real PNG/GIF/JPEG-baseline/JPEG-progressive/WAV
     decodes + sniff-only slices, the q_media_metadata mix);
  3. resume no-op — a second run() must reprocess 0 buckets;
  4. fallback accounting — per-archetype status counts from the 1M run
     are compared against a 10k control run of the same deterministic
     generator: archetype assignment cycles per doc_id, so the
     archetype x status RATES must match (the 1M fallback set is
     exactly the construction's, nothing new appeared at scale).

Usage: python scripts/soak_1m.py [n_docs]   (default 1,000,000)
Prints one JSON line; the BENCH note quotes it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from exstruct_spark.engine import ExtractionJob, default_session  # noqa: E402
from exstruct_spark.media import media_meta_stage  # noqa: E402
from exstruct_spark.pages import spark_pages  # noqa: E402


def media_map(spark):
    """Broadcast blob palette: 8 ids x {png, gif, wav, jpg} with the
    JPEG slice half progressive — same construction as
    q_media_metadata."""
    from exstruct_spark.kernels.gif import encode_gif
    from exstruct_spark.kernels.jpeg import encode_jpeg, encode_jpeg_progressive
    from exstruct_spark.kernels.media import encode_wav
    from exstruct_spark.kernels.png import encode_png

    rows = []
    for i in range(8):
        rng = np.random.default_rng(5000 + i)
        png = encode_png(rng.integers(0, 256, (16 + 8 * i, 24 + 4 * i, 3),
                                      dtype=np.uint8))
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        frames = [rng.integers(0, 8, (12 + 4 * i, 18 + 2 * i))
                  .astype(np.uint8) for _ in range(4)]
        gif = encode_gif(frames, pal, delays_cs=[4] * 4)
        t = np.arange(2000 + 500 * i) / 8000.0
        wav = encode_wav(0.4 * np.sin(2 * np.pi * (220 + 55 * i) * t), 8000)
        xx, yy = np.meshgrid(np.linspace(0, 1, 24 + 4 * i),
                             np.linspace(0, 1, 16 + 8 * i))
        img = np.stack([128 + 80 * np.sin(4 * xx + i) * np.cos(3 * yy)] * 3,
                       axis=2).clip(0, 255).astype(np.uint8)
        enc = encode_jpeg_progressive if i % 4 in (1, 2) else encode_jpeg
        jpg = enc(img, quality=85, subsample=bool(i % 2))
        rows.append((i, bytearray(png), bytearray(gif), bytearray(wav),
                     bytearray(jpg)))
    return F.broadcast(spark.createDataFrame(
        rows, "img_id bigint, png binary, gif binary, wav binary, "
              "jpg binary"))


def with_media(spark, pages):
    blob = (
        F.when(F.xxhash64("url") % 6 == 0, F.col("png"))
        .when(F.xxhash64("url") % 6 == 1, F.col("gif"))
        .when(F.xxhash64("url") % 6 == 2, F.col("wav"))
        .when(F.xxhash64("url") % 6 == 3, F.col("jpg"))
        .when(F.xxhash64("url") % 6 == 4,
              F.concat(F.lit(b"\x1a\x45\xdf\xa3"), F.col("html")))
        .otherwise(F.col("html"))
    )
    return (
        pages.withColumn("img_id", F.pmod(F.xxhash64("url"), F.lit(8)))
        .join(media_map(spark), "img_id")
        .withColumn("media", blob)
        .drop("img_id", "png", "gif", "wav", "jpg")
    )


def archetype_status(df):
    rows = (df.groupBy("archetype", "status").count().collect())
    return {f"{r['archetype']}|{r['status']}": r["count"] for r in rows}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    base = f"/tmp/soak_r5_{n_docs}"
    shutil.rmtree(base, ignore_errors=True)
    spark = default_session(app="soak-1m", master="local[32]",
                            shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    job = ExtractionJob(
        spark,
        output_dir=base + "/out",
        lineage_dir=base + "/lin",
        metrics_dir=base + "/met",
        n_buckets=256,
    )
    pages = with_media(spark, spark_pages(spark, n_docs, partitions=64))

    t0 = time.time()
    r1 = job.run(pages, wave_size=64, stage_input=True)
    t_run = time.time() - t0

    out = spark.read.parquet(base + "/out")
    n_rows = out.count()
    n_urls = out.select("url").distinct().count()

    # media pass over the staged table (partition-pruned source of truth)
    staged = spark.read.parquet(job._staged_path("static"))
    t0 = time.time()
    media = media_meta_stage(staged.select("url", F.col("media").alias("blob")))
    media_counts = {
        f"{r['media_type']}|{bool(r['decoded'])}": r["count"]
        for r in media.groupBy("media_type", "decoded").count().collect()
    }
    t_media = time.time() - t0
    n_media = sum(media_counts.values())

    # resume no-op
    t0 = time.time()
    r2 = job.run(pages, wave_size=64, stage_input=True)
    t_resume = time.time() - t0

    # fallback accounting vs construction: 10k control of the SAME
    # generator — archetypes cycle per doc_id, so rates must match
    # (extraction output has no archetype column; join it back on url)
    big = archetype_status(
        out.select("url", "status")
        .join(staged.select("url", "archetype"), "url"))
    control = spark_pages(spark, 10_000, partitions=32)
    from exstruct_spark.engine import extract_stage
    ctl = archetype_status(
        extract_stage(control, passthrough=("archetype",))
        .select("archetype", "status"))
    big_total = sum(big.values())
    ctl_total = sum(ctl.values())
    rate_delta = {}
    keys = set(big) | set(ctl)
    for k in keys:
        rate_delta[k] = round(
            big.get(k, 0) / big_total - ctl.get(k, 0) / ctl_total, 6)
    max_rate_delta = max(abs(v) for v in rate_delta.values())

    print(json.dumps({
        "n_docs": n_docs,
        "staged_run_sec": round(t_run, 1),
        "docs_per_sec": round(n_rows / t_run, 1),
        "exactly_once": bool(n_rows == n_docs == n_urls),
        "rows": n_rows,
        "resume_sec": round(t_resume, 1),
        "resume_buckets_done_before": r2.get("buckets_done_before"),
        "resume_noop": bool(r2.get("buckets_done_before") == 256
                            and r2.get("rows_in_output") == n_docs),
        "media_pass_sec": round(t_media, 1),
        "media_rows": n_media,
        "media_counts": media_counts,
        "fallback_counts": {k: v for k, v in sorted(big.items())
                            if not k.endswith("|ok")},
        "max_archetype_status_rate_delta_vs_10k_control": max_rate_delta,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
