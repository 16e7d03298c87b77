#!/usr/bin/env python
"""Production-shape BPE measurement (VERDICT r4 #5): vocab 4096 /
512 merges / frequency floor, staged wall times — the reference's own
pattern is to MEASURE the tunable (benchmark/REPORT.md), not describe it.

Two corpora, because they stress different stages:
  * sf0.1 documents.parquet — the driver's corpus.  Its vocabulary is
    intentionally tiny (~31 distinct pre-tokens), so training converges
    in a handful of merges; this measures the ENCODE path over the real
    50k-doc table.
  * a deterministic deep-vocab synthetic corpus (the pytest corpus shape
    scaled up: ~8.2k recurring words in a sliding window + 1 hapax/doc)
    — this measures TRAIN at a realistic vocabulary depth, and the
    min_freq floor has a real hapax tail to drop.

Stages timed separately (same decomposition as q_doc_bpe_real's
docstring): count+floor+top-V collect / driver train_bpe / broadcast +
pandas-UDF encode + agg.

Usage: python scripts/bpe_scale_bench.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = 4096
MERGES = 512
MIN_FREQ = 2


def wname(j: int) -> str:
    s, j = "", j + 1
    while j:
        s += chr(97 + j % 26)
        j //= 26
    return "x" + s


def synth_docs(spark, path: str, n_docs: int = 60000, window: int = 80,
               vocab: int = 8192) -> None:
    """Deep-vocab corpus, generated DISTRIBUTED (mapInPandas over a
    range — no driver-side row list at this size)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                words = [wname((i + k) % vocab) for k in range(window)]
                words.append(wname(10_000_000 + i))  # hapax
                text = " ".join(words)
                rows.append(("en" if i % 2 else "de", text, len(text)))
            yield pd.DataFrame(rows, columns=["lang", "text", "n_chars"])

    (spark.range(n_docs).repartition(32)
     .mapInPandas(gen, "lang string, text string, n_chars int")
     .write.mode("overwrite").parquet(path))


def staged_run(spark, sf_dir: str) -> dict:
    """q_doc_bpe_real's exact stages with per-stage timers."""
    from pyspark.sql import functions as F

    from exstruct_spark.kernels.bpe import (
        bpe_token_count, count_pretokens, train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("n_chars") > 0)

    def count_batches(batches):
        for pdf in batches:
            c = count_pretokens(pdf["text"].tolist())
            yield pd.DataFrame({"w": list(c.keys()), "cnt": list(c.values())})

    t0 = time.time()
    tok_freq = (docs.select("text")
                .mapInPandas(count_batches, "w string, cnt bigint")
                .groupBy("w").agg(F.sum("cnt").alias("cnt"))
                .where(F.col("cnt") >= MIN_FREQ))
    top = tok_freq.orderBy(F.desc("cnt"), "w").limit(VOCAB).collect()
    t_count = time.time() - t0

    t0 = time.time()
    merges = train_bpe({r["w"]: r["cnt"] for r in top}, MERGES)
    t_train = time.time() - t0

    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        rk = bc.value
        cache: dict = {}
        return texts.map(lambda t: bpe_token_count(t or "", rk, cache))

    t0 = time.time()
    agg = (docs.select("lang", n_bpe("text").alias("bpe_tok"))
           .groupBy("lang")
           .agg(F.count("*").alias("docs"),
                F.sum("bpe_tok").cast("bigint").alias("total")))
    rows = {r["lang"]: (r["docs"], r["total"]) for r in agg.collect()}
    t_encode = time.time() - t0

    n_docs = sum(d for d, _ in rows.values())
    total_tok = sum(t for _, t in rows.values())
    return {
        "docs": n_docs,
        "vocab_collected": len(top),
        "merges_trained": len(merges),
        "count_collect_sec": round(t_count, 2),
        "train_sec": round(t_train, 2),
        "encode_sec": round(t_encode, 2),
        "encode_docs_per_sec": round(n_docs / max(t_encode, 1e-9), 1),
        "total_bpe_tokens": int(total_tok),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from exstruct_spark.engine import default_session

    spark = default_session(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    result = {"vocab_words": VOCAB, "n_merges": MERGES, "min_freq": MIN_FREQ}
    result["driver_corpus_sf0.1"] = staged_run(spark, sf_dir)

    synth_dir = "/tmp/bpe_scale_corpus"
    synth_docs(spark, f"{synth_dir}/documents.parquet")
    result["deep_vocab_synth_60k"] = staged_run(spark, synth_dir)
    shutil.rmtree(synth_dir, ignore_errors=True)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
