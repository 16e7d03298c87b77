"""Spark layer for multimodal columns: binary blobs -> typed metadata.

One ``mapInPandas`` stage over Arrow batches (zero per-row Python), same
fusion discipline as the HTML extraction stage.  Codec-dependent steps
are stubs (see kernels/media.py) — the schema, batching, and partitioning
are the real, tested contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from exstruct_spark.kernels.media import MEDIA_META_SCHEMA_DDL, media_meta_pdf


def media_meta_stage(
    blobs: DataFrame, key_col: str = "url", blob_col: str = "blob",
    mode: str = "fake", feature_dim: int = 8, budget=None,
) -> DataFrame:
    """(key, blob binary) df -> typed media-metadata df.

    ``feature_dim``: width of the stub feature vector — 64 matches the
    sign-LSH plane matrix so stub features flow straight into the real
    ANN/near-dup operators (queries.py media_neardup / media_ann_topk).

    ``budget``: a ``kernels.media.DecodeBudget`` for corpus mode —
    bounds the interpreter-speed webp pixel decodes per blob (pixel
    cap) and per batch (time cap); degrades are marked per row
    (``budget_degraded``) and ``media_decode_ledger`` aggregates the
    accounting.  None (default) = full-depth decode for the
    dedup-verify stage."""
    key_field = blobs.schema[key_col]
    schema = f"{key_field.name} {key_field.dataType.simpleString()}, {MEDIA_META_SCHEMA_DDL}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield media_meta_pdf(
                pdf, blob_col=blob_col, mode=mode,
                feature_dim=feature_dim, budget=budget,
            )

    return blobs.select(key_col, blob_col).mapInPandas(run, schema=schema)


def media_decode_ledger(meta: DataFrame) -> DataFrame:
    """Decode-budget accounting (the no-silent-caps rule applied to CPU
    seconds): one cheap aggregation over the media-metadata output —
    per media type: blobs seen, real decodes, budget degrades, and
    decode wall time.  ``blobs == decoded + budget_degraded + other``
    never hides a row; a corpus-mode run's ledger accounts for every
    degrade the budget caused."""
    from pyspark.sql import functions as F

    return meta.groupBy("media_type").agg(
        F.count("*").alias("blobs"),
        F.sum(F.col("decoded").cast("long")).alias("decoded"),
        F.sum(F.col("budget_degraded").cast("long")).alias(
            "budget_degraded"),
        F.round(F.sum("decode_ms"), 3).alias("decode_ms_total"),
        F.round(F.max("decode_ms"), 3).alias("decode_ms_max"),
    )


def render_tables_stage(
    extracted: DataFrame, url_col: str = "url",
    json_col: str = "extraction_json",
) -> DataFrame:
    """S7 render sink, Spark side: extracted documents -> one PNG per
    extracted table (kernels/render.py — real bytes via the repo's own
    encoder, reference-parity sanitized ordered filenames).  One
    mapInPandas stage, rows explode doc -> tables inside the batch; at
    100 TB this is embarrassingly parallel and the output is a binary
    COLUMN (write it as parquet/partitioned files downstream — the
    reference's one-file-per-page layout is `export_rendered_pngs`,
    the small-corpus export path)."""
    from exstruct_spark.kernels.render import render_doc_tables

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, ejson in zip(pdf[url_col], pdf[json_col]):
                for (name, png, w, h, n_glyphs,
                     truncated) in render_doc_tables(url, ejson):
                    rows.append(
                        (url, name, bytearray(png), w, h, n_glyphs,
                         truncated))
            yield pd.DataFrame(
                rows,
                columns=["url", "file_name", "png", "width", "height",
                         "n_glyphs", "glyphs_truncated"],
            )

    return extracted.select(url_col, json_col).mapInPandas(
        run,
        schema="url string, file_name string, png binary, "
               "width int, height int, n_glyphs int, "
               "glyphs_truncated boolean",
    )


def export_rendered_pngs(rendered: DataFrame, out_dir: str) -> int:
    """Write one ``.png`` FILE per rendered table (the reference's
    per-page file layout, render/__init__.py:602-658).  Executor-side
    ``foreachPartition`` — no driver collect; suitable for bounded
    exports (a crawl sample, a debug corpus), while the parquet binary
    column remains the at-scale representation."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        # yields the per-partition written-file count so the returned
        # total counts exactly what THIS export wrote, executor-side —
        # a driver-side listdir would be wrong on any non-local cluster
        # (files land on executor disks) and would also count
        # pre-existing files in out_dir
        n = 0
        for row in rows:
            with open(os.path.join(out_dir, row.file_name), "wb") as fh:
                fh.write(bytes(row.png))
            n += 1
        yield n

    return sum(rendered.rdd.mapPartitions(write_part).collect())


def image_pairs_stage(extracted: DataFrame, min_text_chars: int = 3,
                      url_col: str = "url",
                      json_col: str = "extraction_json") -> DataFrame:
    """LAION-style image-text pair mining over extracted documents:
    explode the extraction's ``images`` family (every <img> with alt /
    figcaption / declared dims, kernels/extract.py) into
    ``(url, src, text, width, height)`` rows, keeping pairs whose text
    clears ``min_text_chars`` — the input shape of caption-dataset
    curation (pair harvesting feeds the dedup/quality/ANN machinery
    this engine already ships for text and media).

    Pure JVM-side plan: one JSON path + from_json + explode — no Python
    at the Spark boundary, scan-local at any scale."""
    from pyspark.sql import functions as F

    schema = ("array<struct<src:string,alt:string,caption:string,"
              "w:int,h:int>>")
    imgs = F.from_json(
        F.get_json_object(F.col(json_col), "$.images"), schema)
    return (
        extracted
        .select(F.col(url_col).alias("url"), F.explode(imgs).alias("im"))
        .select(
            "url",
            F.col("im.src").alias("src"),
            F.coalesce(F.col("im.caption"), F.col("im.alt")).alias("text"),
            F.col("im.w").alias("width"),
            F.col("im.h").alias("height"),
        )
        .where(F.length(F.trim(F.col("text"))) >= min_text_chars)
    )
