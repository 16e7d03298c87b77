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
    mode: str = "fake", feature_dim: int = 8,
) -> DataFrame:
    """(key, blob binary) df -> typed media-metadata df.

    ``feature_dim``: width of the stub feature vector — 64 matches the
    sign-LSH plane matrix so stub features flow straight into the real
    ANN/near-dup operators (queries.py media_neardup / media_ann_topk)."""
    key_field = blobs.schema[key_col]
    schema = f"{key_field.name} {key_field.dataType.simpleString()}, {MEDIA_META_SCHEMA_DDL}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield media_meta_pdf(
                pdf, blob_col=blob_col, mode=mode, feature_dim=feature_dim
            )

    return blobs.select(key_col, blob_col).mapInPandas(run, schema=schema)
