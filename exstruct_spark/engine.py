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
    EXTRACT_SCHEMA_DDL + ", partition_id int, batch_seq int, batch_wall_ms bigint"
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

    Shuffle scratch stays on Spark's default local dir;
    ``$SPARK_GRAFT_LOCAL_DIR`` overrides it for deployments with faster
    scratch.  (r8 measured: forcing tmpfs /dev/shm here SLOWED the
    shuffle-bearing queries ~10x on this virtualized host — guest page
    allocation latency dwarfs page-cache-backed disk writes — so the
    default is deliberately untouched.)
    """
    import os

    builder = (
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
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()


# -- external-stylesheet corpus join (VERDICT r6 #2) -------------------------
# <link rel=stylesheet href> is unread by the pure per-page extractor, yet
# the crawl CONTAINS most of those CSS files as its own documents.  This is
# the genuinely Spark-shaped operator the single-process reference cannot
# have: a cheap JVM-regex harvest pass over the pages, an equi-join of the
# harvested refs against the corpus's stylesheet documents (broadcast when
# the css side fits — it is a tiny fraction of any real crawl), and a
# per-page collect in link order.  The joined sheet texts ride the SAME
# Arrow batch into the fused extraction stage, where kernels/css.py merges
# them below same-document <style> rules.  At 10^12 docs: the harvest is
# scan-local (whole-stage codegen, no Python), the refs->css join shuffles
# only the refs (pages that actually link sheets), and the pages<-sheets
# left join keys on url — the same key extract_stage repartitions by, so
# AQE/exchange reuse co-locates it.

# quote-aware tag capture, mirroring dom._TOKEN_RE's attr alternation:
# a quoted '>' inside an attribute must not truncate the tag, or the
# harvest's href parse diverges from the kernel's
_LINK_TAG_RE = r"(?i)<link\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
_BASE_TAG_RE = r"(?i)<base\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
_REL_STYLESHEET_RE = "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bstylesheet\\b"
_CSS_URL_RE = r"(?i)\.css([?#].*)?$"
# @import url("x.css") / @import "x.css" — permissive single-group scan
# (the inner join against corpus sheets drops any false positive)
_CSS_IMPORT_RE = r"(?i)@import\s+(?:url\(\s*)?[\"']?([^\"'()\s;]+)"
_MAX_IMPORTS_PER_SHEET = 8


_TAG_NAME_RE = None  # lazily-compiled in _attrs_of_tag (worker-side)


def _attrs_of_tag(tag_text: str) -> dict:
    """Attribute dict of one captured tag, via the KERNEL's attr
    parser (sixth-pass review lesson: every harvest-side
    re-implementation of attribute parsing diverged from the kernel in
    some corner — quoting, entities, data-* false matches; importing
    the same function makes parity structural)."""
    global _TAG_NAME_RE
    import re as _re

    from exstruct_spark.kernels.dom import _parse_attrs

    if _TAG_NAME_RE is None:
        _TAG_NAME_RE = _re.compile(r"^<[a-zA-Z][a-zA-Z0-9:-]*")
    t = _TAG_NAME_RE.sub("", tag_text or "").rstrip(">")
    # a self-close slash glued to an unquoted value (href=x/>) is the
    # tokenizer's group, not value text
    if t.endswith("/"):
        t = t[:-1]
    return _parse_attrs(t)


def _first_base_href(tag_list) -> Optional[str]:
    """Kernel rule: the FIRST <base> WITH a non-empty href wins."""
    for t in (tag_list if tag_list is not None else ()):
        h = (_attrs_of_tag(t).get("href") or "").strip()
        if h:
            return h
    return None


def _candidate_urls(page_url, bases, href) -> Optional[list]:
    """href resolved under each base interpretation + no-base —
    distinct, order-preserving.  Shared by the link and style-import
    harvest UDFs."""
    from urllib.parse import urljoin

    cands: list = []
    for b in (*bases, None):
        try:
            base = urljoin(page_url or "", b) if b else (page_url or "")
            r = urljoin(base, href)
        except ValueError:
            continue
        if r and r not in cands:
            cands.append(r)
    return cands or None


def harvest_stylesheet_refs(pages: DataFrame) -> DataFrame:
    """Pass-1 harvest: pages -> (url, link_order, css_url).

    Pure JVM (regexp over ``cast(html as string)`` — tolerant of non-UTF8
    bytes, unlike ``decode``) except the final href resolution, which is
    one Arrow-batched pandas UDF over the already-tiny harvested rows
    (a few per page, zero for most).  The regex harvest is deliberately
    permissive; the authoritative per-page list (exact DOM walk, base
    resolution, first-wins dedup) is the ``stylesheets`` extraction
    field — at join time permissive is correct because a harvested URL
    that matches no corpus document simply drops out of the inner join.
    """
    import pandas as pd  # noqa: F811 (kernel import pattern)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _resolve_candidates(page_url: pd.Series, bt_stripped: pd.Series,
                            bt_noscript: pd.Series, bt_raw: pd.Series,
                            link_tag: pd.Series) -> pd.Series:
        out = []
        for u, b1, b2, b3, tag in zip(page_url, bt_stripped,
                                      bt_noscript, bt_raw, link_tag):
            h = (_attrs_of_tag(tag).get("href") or "").strip()
            if not h:
                out.append(None)
                continue
            out.append(_candidate_urls(
                u, (_first_base_href(b1), _first_base_href(b2),
                    _first_base_href(b3)), h))
        return pd.Series(out, dtype=object)

    @pandas_udf("array<string>")
    def _resolve_import_candidates(
            page_url: pd.Series, bt_stripped: pd.Series,
            bt_noscript: pd.Series, bt_raw: pd.Series,
            href: pd.Series) -> pd.Series:
        # style-block @import targets are raw CSS text — NO entity
        # decoding (the DOM stores raw-text content verbatim)
        out = []
        for u, b1, b2, b3, h in zip(page_url, bt_stripped,
                                    bt_noscript, bt_raw, href):
            h = (h or "").strip()
            if not h:
                out.append(None)
                continue
            out.append(_candidate_urls(
                u, (_first_base_href(b1), _first_base_href(b2),
                    _first_base_href(b3)), h))
        return pd.Series(out, dtype=object)

    html_s = F.col("html").cast("string")
    # BASE RESOLUTION CANDIDATES, not one guess (fourth/fifth-pass
    # review findings): a regex cannot reproduce the DOM's
    # comment/raw-text rules, and with the kernel as the apply-time
    # authority a wrong join key silently loses the page's styling.
    # So every link is resolved under FOUR base interpretations —
    # comment-stripped (mirroring dom.py's unterminated-comment-to-EOF
    # rule), script/style-then-comment-stripped (a fake '<base' string
    # inside script raw text must not shadow the document's real base;
    # close-tag rule mirrors dom's  </script\b ), raw (covers a real
    # <base> the strips wrongly ate), and no-base — and each distinct
    # result becomes a candidate join key.  Whichever matches the
    # kernel's authoritative list is admitted; the extras are phantom
    # join rows the admit filter discards (and the kernel orders
    # admitted sheets by ITS list, so phantom link_order collisions
    # cannot perturb the cascade).  Same design as the missing media
    # filter: the harvest may over-include, never miss.  Base TAGS
    # (not href values) ship to the UDF so the kernel attr parser
    # reads them; first-8 cap bounds a hostile page.
    _comment_re = r"(?s)<!--.*?(?:-->|$)"
    _rawtext_re = r"(?is)<(script|style)\b.*?(?:</\1\b|$)"

    def _base_tags(col):
        return F.slice(
            F.regexp_extract_all(col, F.lit(_BASE_TAG_RE), 0), 1, 8)

    tags = pages.select(
        "url",
        _base_tags(
            F.regexp_replace(html_s, _comment_re, "")
        ).alias("bt_stripped"),
        _base_tags(
            F.regexp_replace(
                F.regexp_replace(html_s, _rawtext_re, ""),
                _comment_re, "")
        ).alias("bt_noscript"),
        _base_tags(html_s).alias("bt_raw"),
        F.posexplode(
            F.regexp_extract_all(html_s, F.lit(_LINK_TAG_RE), 0)
        ).alias("link_order", "tag"),
    )
    # NO media filtering here, by design (r7 second-pass finding): a
    # regex over raw tag text cannot reliably parse attributes (it
    # matched inside data-media=/title= values), and a false NEGATIVE
    # at harvest time would silently drop a sheet the page needs.  The
    # harvest stays a pure over-approximation; the kernel's
    # _stylesheet_refs (real attribute parse + media_applies_on_screen)
    # is the single authority — extract_document applies a joined sheet
    # only when its URL is on that authoritative list.
    refs = (
        tags.where(F.col("tag").rlike(_REL_STYLESHEET_RE))
        .select(
            "url", "link_order",
            F.explode(
                _resolve_candidates(
                    "url", "bt_stripped", "bt_noscript",
                    "bt_raw", "tag")
            ).alias("css_url"),
        )
        .where(F.col("css_url").isNotNull())
    )
    # inline <style> @import targets (the legacy-theme idiom): style
    # BLOCKS captured with the raw-text close rule (</style\b, like
    # dom._RAW_CLOSE_RE), their @import hrefs harvested permissively
    # (the kernel's strict top-of-sheet + media rule decides what
    # actually applies); link_order offset keeps these keys after the
    # page's links for the dedup min() — the kernel orders the cascade
    # from its own list regardless.
    _style_block_re = (r"(?is)<style\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
                       r".*?(?:</style\b|$)")
    style_imports = (
        pages.select(
            "url",
            _base_tags(
                F.regexp_replace(html_s, _comment_re, "")
            ).alias("bt_stripped"),
            _base_tags(
                F.regexp_replace(
                    F.regexp_replace(html_s, _rawtext_re, ""),
                    _comment_re, "")
            ).alias("bt_noscript"),
            _base_tags(html_s).alias("bt_raw"),
            F.posexplode(
                F.slice(
                    F.regexp_extract_all(
                        html_s, F.lit(_style_block_re), 0),
                    1, 8)
            ).alias("style_pos", "block"),
        )
        .select(
            "url", "bt_stripped", "bt_noscript", "bt_raw", "style_pos",
            F.posexplode(
                F.slice(
                    F.regexp_extract_all(
                        F.col("block"), F.lit(_CSS_IMPORT_RE), 1),
                    1, _MAX_IMPORTS_PER_SHEET)
            ).alias("imp_pos", "imp_href"),
        )
        .where(F.col("imp_href") != "")
        .select(
            "url",
            (F.lit(100_000) + F.col("style_pos") * 100
             + F.col("imp_pos")).alias("link_order"),
            F.explode(
                _resolve_import_candidates(
                    "url", "bt_stripped", "bt_noscript",
                    "bt_raw", "imp_href")
            ).alias("css_url"),
        )
        .where(F.col("css_url").isNotNull())
    )
    refs = refs.unionByName(style_imports)
    # same sheet linked twice: keep the first position (kernel parity)
    return refs.groupBy("url", "css_url").agg(
        F.min("link_order").alias("link_order")
    )


def attach_external_css(
    pages: DataFrame,
    css_docs: Optional[DataFrame] = None,
    broadcast_css: bool = True,
) -> DataFrame:
    """pages (url, html, ...) -> same + ``external_css
    array<struct<u: string, t: string>>`` — per entry the LINK's
    resolved URL and the sheet text (imports carry their importer's
    link URL).

    ``css_docs``: the corpus's stylesheet documents as (url, html) — by
    default derived from ``pages`` itself by url shape (``*.css``).
    ``broadcast_css``: hint that the distinct stylesheet side fits in
    memory (true on any real crawl slice — sheets are a small fraction
    of pages and heavily shared); pass False to let AQE pick the
    strategy for a css-heavy corpus.
    """
    import pandas as pd  # noqa: F811 (kernel import pattern)
    from pyspark.sql.functions import pandas_udf

    refs = harvest_stylesheet_refs(pages)
    if css_docs is None:
        css_docs = pages.where(F.col("url").rlike(_CSS_URL_RE))
    sheets = css_docs.select(
        F.col("url").alias("css_url"),
        F.col("html").cast("string").alias("css_text"),
    )
    right = F.broadcast(sheets) if broadcast_css else sheets
    joined = (refs.join(right, "css_url", "inner")
              .withColumn("link_url", F.col("css_url")))

    # ONE level of @import chasing: real sheets routinely import a base/
    # theme sheet that is itself in the corpus.  Imported sheets order
    # immediately BEFORE their importer (CSS applies @import rules ahead
    # of the importing sheet's own), capped per sheet; a second import
    # level is deliberately not chased (documented bound, not a loop).
    @pandas_udf("string")
    def _resolve_import(sheet_url: pd.Series,
                        href: pd.Series) -> pd.Series:
        from urllib.parse import urljoin

        out = []
        for u, h in zip(sheet_url, href):
            try:
                out.append(urljoin(u or "", h or "") or None)
            except ValueError:
                out.append(None)
        return pd.Series(out, dtype=object)

    imports = (
        joined.select(
            "url", "link_order", "css_url", "link_url",
            F.posexplode(
                F.slice(
                    F.regexp_extract_all(
                        F.col("css_text"), F.lit(_CSS_IMPORT_RE), 1),
                    1, _MAX_IMPORTS_PER_SHEET)
            ).alias("imp_pos", "imp_href"),
        )
        .where(F.col("imp_href") != "")
        .select(
            "url", "link_order", "imp_pos", "link_url",
            _resolve_import("css_url", "imp_href").alias("css_url"),
        )
        .where(F.col("css_url").isNotNull())
        .join(right, "css_url", "inner")
        .select("url", "link_order", "link_url",
                F.lit(0).alias("tier"), "imp_pos", "css_text")
    )
    direct = joined.select(
        "url", "link_order", "link_url",
        F.lit(1).alias("tier"), F.lit(0).alias("imp_pos"), "css_text")
    # each entry carries the LINK's resolved URL (imports carry their
    # importer's link URL) so the kernel can align entries against its
    # own authoritative _stylesheet_refs list — the harvest being
    # permissive is then safe: a sheet the kernel's media/attribute
    # parse rejects is joined but never applied
    per_page = (
        direct.unionByName(imports)
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("link_order").alias("o"),
                        F.col("tier").alias("g"),
                        F.col("imp_pos").alias("p"),
                        F.col("link_url").alias("u"),
                        F.col("css_text").alias("t"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "url",
            F.expr("transform(ordered, s -> struct(s.u as u, s.t as t))"
                   ).alias("external_css"),
        )
    )
    return pages.join(per_page, "url", "left")


def extract_stage(
    pages: DataFrame,
    opts: ExtractOptions = ExtractOptions(),
    repartition_to: Optional[int] = None,
    passthrough: tuple = (),
    use_external_css: bool = False,
) -> DataFrame:
    """The fused extraction transform: pages df -> extraction df.

    ``repartition_to``: explicit url-hash repartition width (None = keep
    upstream partitioning — no shuffle).  Each batch records its task
    partition id, batch sequence number and wall time so metrics are
    derivable with one cheap aggregation downstream (SURVEY.md §2.4 A7 —
    lineage as first-class).

    ``passthrough``: extra input columns carried through the Arrow batch
    verbatim (lang, archetype, warc_ts, url_bucket, ...).  At 10^12 docs a
    downstream re-join on url to recover these is a full extra shuffle —
    carrying them through the same batch is free.

    ``use_external_css``: the input carries an ``external_css`` column
    (from ``attach_external_css``) — ride it into the batch so the
    kernel's StyleResolver sees corpus-joined stylesheet rules.
    """
    df = pages
    if repartition_to:
        df = df.repartition(repartition_to, F.xxhash64("url"))

    # field names via the real DDL parser — a positional token split would
    # silently yield garbage names (weakening the collision check) if any
    # type ever gained a space, e.g. 'decimal(10, 2)' (ADVICE r2)
    from pyspark.sql.types import StructType

    reserved = set(StructType.fromDDL(EXTRACT_WITH_PARTITION_DDL).fieldNames())
    for col in passthrough:
        if col in reserved:
            raise ValueError(f"passthrough column collides with output: {col}")
    pass_ddl = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in df.select(*passthrough).schema.fields
    ) if passthrough else ""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for seq, pdf in enumerate(batches):
            t0 = time.monotonic()
            out = extract_pdf(pdf, opts)
            wall_ms = int((time.monotonic() - t0) * 1000)
            out["partition_id"] = pid
            out["batch_seq"] = seq
            out["batch_wall_ms"] = wall_ms
            for col in passthrough:
                out[col] = pdf[col].values
            yield out

    extra_in = ("external_css",) if use_external_css else ()
    return df.select("url", "html", *extra_in, *passthrough).mapInPandas(
        run, schema=EXTRACT_WITH_PARTITION_DDL + pass_ddl
    )


def metrics_from_extracted(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition extraction metrics (FIXTURES.md §3 contract).

    One narrow groupBy on the small extracted projection — partial
    (map-side) aggregation makes this shuffle negligible at any scale.

    ``wall_ms`` is the SUM over the partition's Arrow batches of each
    batch's wall time (rows within a batch all carry the same
    ``batch_wall_ms``, so the inner max collapses them to one value per
    batch) — a partition processing many batches reports its true total,
    not its slowest single batch.
    """
    per_batch = extracted.groupBy("partition_id", "batch_seq").agg(
        F.count("*").alias("docs"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("fallback"),
        F.sum(F.when(F.col("truncated"), 1).otherwise(0)).alias("truncated"),
        F.max("batch_wall_ms").alias("batch_wall_ms"),
    )
    return (
        per_batch.groupBy("partition_id")
        .agg(
            F.sum("docs").alias("docs"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("ok").alias("ok"),
            F.sum("fallback").alias("fallback"),
            F.sum("truncated").alias("truncated"),
            F.sum("batch_wall_ms").alias("wall_ms"),
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


class TableIO:
    """Source/sink format adapter — the Iceberg seam.

    BASELINE's input hint names an Iceberg table of Common-Crawl-style
    pages; this sandbox has no Iceberg runtime, so the job's every read
    and write goes through ONE format indirection instead of hard-coded
    ``.parquet(...)`` calls.  ``TableIO("iceberg")`` routes through
    ``spark.read.format("iceberg").load(path)`` / ``df.write.format(
    "iceberg").save(path)`` — the public path-based (HadoopTables) usage
    — so deploying against a real catalog is a constructor argument, not
    a code change.  ``parquet`` (default) is byte-for-byte the previous
    behavior: ``format("parquet").load/save`` is exactly ``.parquet()``.
    """

    # file-based sources accept a user-specified read schema; DSv2
    # catalog sources (Iceberg) REJECT one ('does not support user
    # specified schema') — their table metadata is authoritative
    _FILE_FORMATS = frozenset({"parquet", "json", "csv", "orc", "text", "avro"})

    def __init__(self, fmt: str = "parquet"):
        self.format = fmt

    def read(self, spark: SparkSession, path: str, schema: Optional[str] = None) -> DataFrame:
        if self.format == "yaml":
            # mirror the reference exactly: YAML is a one-way EXPORT
            # surface (io/__init__.py:159-168 save_as_yaml writes, nothing
            # reads YAML back) — a silent text-read here would hand the
            # caller unparsed documents
            raise NotImplementedError(
                "YAML is an export-only dialect (reference parity: "
                "save_as_yaml has no reader); keep pipeline tables on "
                "parquet/json and export with TableIO('yaml').write"
            )
        reader = spark.read
        if schema is not None and self.format in self._FILE_FORMATS:
            reader = reader.schema(schema)
        return reader.format(self.format).load(path)

    @staticmethod
    def _to_yaml_docs(df: DataFrame, partition_by: tuple) -> DataFrame:
        """Rows -> one YAML document per row (multi-doc stream: each doc
        opens with '---').  JVM-side ``to_json`` flattens the row (null
        fields dropped, binary -> base64), then ONE Arrow-batched pandas
        UDF re-emits the reference YAML dialect (kernels/serialize.py
        ``canonical_yaml``) — no row-at-a-time Python at the boundary.
        Partition columns stay as real columns for partitionBy."""
        from exstruct_spark.kernels.serialize import canonical_yaml

        @F.pandas_udf("string")
        def _yaml_doc(js: pd.Series) -> pd.Series:
            import json as _json

            return js.map(
                lambda s: "---\n" + canonical_yaml(_json.loads(s)).rstrip("\n")
            )

        data_cols = [c for c in df.columns if c not in partition_by]
        keep = [F.col(c) for c in partition_by]
        return df.select(
            _yaml_doc(F.to_json(F.struct(*data_cols))).alias("value"), *keep
        )

    def write(self, df: DataFrame, path: str, mode: str,
              partition_by: tuple = (), dynamic: bool = False) -> None:
        fmt = self.format
        if fmt == "yaml":
            df = self._to_yaml_docs(df, tuple(partition_by))
            fmt = "text"
        writer = df.write.mode(mode).format(fmt)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if not dynamic:
            writer.save(path)
            return
        # dynamic partition overwrite: file sources honor the per-write
        # option, but DSv2 sources (Iceberg) resolve SaveMode.Overwrite
        # via the SESSION conf spark.sql.sources.partitionOverwriteMode —
        # the option alone would truncate an Iceberg table to the current
        # wave's partitions (review r3 finding).  Set both, restore after.
        conf = df.sparkSession.conf
        key = "spark.sql.sources.partitionOverwriteMode"
        old = conf.get(key, None)
        conf.set(key, "dynamic")
        try:
            writer.option("partitionOverwriteMode", "dynamic").save(path)
        finally:
            if old is None:
                conf.unset(key)
            else:
                conf.set(key, old)


class ExtractionJob:
    """Checkpoint-resumable extraction run over a pages table.

    Resume semantics (SURVEY.md §7.4 hard-part 5): the unit of completion
    is a url-hash *bucket* (``pmod(xxhash64(url), n_buckets)``).  A
    lineage table records ``status='done'`` per bucket; a restarted run
    LEFT ANTI JOINs inputs against done buckets, so partially completed
    crawls never recompute finished work, and per-bucket output overwrite
    keeps the sink idempotent (dynamic partition overwrite).

    Resume assumes a FIXED input snapshot (``input_snapshot`` names it),
    and the assumption is ENFORCED, not conventional: lineage rows are
    keyed by snapshot, so a run against a NEW snapshot never anti-joins
    away buckets completed for an old one — every bucket of the new
    snapshot is (re)processed and the per-bucket dynamic overwrite keeps
    the output consistent.

    Scale shape (the 100 TB contract): the input is STAGED ONCE as a
    bucket-partitioned parquet table per snapshot; each wave then reads
    only its buckets via partition pruning.  Without staging, every wave
    re-scans the full input (64 buckets / 16 per wave = 4 full scans of a
    100 TB table), and enumerating buckets with ``distinct().collect()``
    adds a fifth — here bucket enumeration is ONE filesystem listing of
    the staged partition directories.
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
        staging_dir: Optional[str] = None,
        table_format: str = "parquet",
    ):
        self.spark = spark
        self.output_dir = output_dir
        self.lineage_dir = lineage_dir
        self.metrics_dir = metrics_dir
        self.n_buckets = n_buckets
        self.opts = opts
        self.code_version = code_version
        self.staging_dir = staging_dir or output_dir.rstrip("/") + ".staging"
        # output/lineage/metrics tables go through the format seam
        # (TableIO); the STAGING table stays parquet — it is the job's own
        # scratch space whose bucket enumeration and _SUCCESS idempotence
        # are filesystem-listing based by design
        self.io = TableIO(table_format)

    # -- filesystem helpers (Hadoop FS API: works on local/HDFS/S3A) ------
    def _fs(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, hpath

    def _staged_path(self, input_snapshot: str) -> str:
        # snapshot names may be paths/URIs ("iceberg:db.tbl", "s3://...");
        # percent-encode for the directory name like partitionBy would
        from urllib.parse import quote

        return f"{self.staging_dir}/snapshot={quote(input_snapshot, safe='')}"

    def _output_schema_ddl(self) -> str:
        return (
            EXTRACT_WITH_PARTITION_DDL
            + ", url_bucket int, input_snapshot string"
        )

    def _stage_input(self, pages: DataFrame, input_snapshot: str) -> str:
        """Write the bucketed input ONCE per snapshot, partitioned by
        url_bucket (idempotent: a complete staging — _SUCCESS present — is
        reused; an interrupted one is rewritten).  This is the single full
        input scan of the whole job."""
        staged = self._staged_path(input_snapshot)
        fs, hpath = self._fs(staged + "/_SUCCESS")
        if fs.exists(hpath):
            return staged
        bucketed = pages.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int")
        )
        bucketed.write.mode("overwrite").partitionBy("url_bucket").parquet(staged)
        return staged

    def _list_staged_buckets(self, staged: str) -> list:
        """Bucket enumeration = one directory listing of the staged table's
        partition dirs (``url_bucket=N``) — no table scan, no distinct."""
        fs, hpath = self._fs(staged)
        buckets = []
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if name.startswith("url_bucket="):
                buckets.append(int(name.split("=", 1)[1]))
        return sorted(buckets)

    def _done_buckets(self, input_snapshot: str) -> set:
        """Buckets already completed FOR THIS SNAPSHOT (lineage filtered on
        both status and input_snapshot — a different snapshot's completions
        never mask new work)."""
        try:
            lineage = self.io.read(self.spark, self.lineage_dir)
        except Exception:
            return set()
        rows = (
            lineage.where(
                (F.col("status") == "done")
                & (F.col("input_snapshot") == input_snapshot)
            )
            .select("url_bucket")
            .distinct()
            .collect()
        )
        return {r["url_bucket"] for r in rows}

    def _run_wave(
        self, staged: DataFrame, wave_buckets: list, run_id: str,
        input_snapshot: str,
    ) -> None:
        """Process one wave of buckets END-TO-END: extract -> write output
        partitions -> write metrics -> append lineage.  Lineage lands only
        after the wave's output is durable, so a crash between waves loses
        at most one wave of work (incremental checkpointing — a whole-run
        lineage commit would resume from zero after a mid-job failure).

        ``staged`` is the bucket-partitioned staging table, so the filter
        below is a PARTITION FILTER — the wave reads only its own buckets'
        files, never the full input.

        Output is partitioned by (input_snapshot, url_bucket): snapshots
        never share partitions, so a new snapshot's dynamic overwrite can
        neither leave another snapshot's rows looking current nor have
        them mis-attributed to this run's metrics."""
        todo = staged.where(F.col("url_bucket").isin(wave_buckets))
        # url_bucket rides through the Arrow batch (passthrough) — no
        # re-hash, no re-join to recover the sink partition key.
        # A staged external_css column (attach_external_css ran on the
        # full corpus BEFORE staging — the join must see page and sheet
        # regardless of bucket) is auto-detected and ridden in; patch
        # refreshes reuse the staged sheets unchanged.
        extracted = extract_stage(
            todo, self.opts, passthrough=("url_bucket",),
            use_external_css="external_css" in staged.columns,
        ).withColumn("input_snapshot", F.lit(input_snapshot))
        self.io.write(
            extracted, self.output_dir, "overwrite",
            partition_by=("input_snapshot", "url_bucket"), dynamic=True,
        )
        # read back only the wave's output partitions (pruned) for
        # metrics; the explicit schema keeps an all-empty wave readable
        # (schema inference has no data files to look at then)
        wave_out = (
            self.io.read(
                self.spark, self.output_dir, schema=self._output_schema_ddl()
            )
            .where(
                (F.col("input_snapshot") == input_snapshot)
                & F.col("url_bucket").isin(wave_buckets)
            )
        )
        self.io.write(
            metrics_from_extracted(wave_out, run_id), self.metrics_dir, "append"
        )
        done_rows = [
            (run_id, int(b), input_snapshot, self.code_version, "done")
            for b in wave_buckets
        ]
        done_df = (
            self.spark.createDataFrame(
                done_rows,
                "run_id string, url_bucket int, input_snapshot string, "
                "code_version string, status string",
            )
            .withColumn("completed_at", F.current_timestamp())
        )
        self.io.write(done_df, self.lineage_dir, "append")

    def run(
        self,
        pages: DataFrame,
        input_snapshot: str = "static",
        wave_size: int = 16,
        max_waves: Optional[int] = None,
        stage_input: bool = True,
    ) -> dict:
        """Execute (or resume) an extraction run in waves of buckets.

        ``wave_size``: buckets per checkpoint commit (resume granularity).
        ``max_waves``: stop early after N waves (testing/chunked runs).
        ``stage_input``: True (default, the 100 TB shape) materializes the
        bucketed input once so each wave is a partition-pruned read —
        pays one input write to avoid buckets/wave_size full input scans.
        False skips staging for inputs that are CHEAP to re-scan or
        already partition-pruned at the source (an Iceberg table
        partitioned by the bucket key, or a synthetic generator): waves
        filter the input directly and buckets are enumerated statically
        as range(n_buckets) — never a corpus-wide distinct().
        Returns a summary dict."""
        run_id = uuid.uuid4().hex[:12]
        if stage_input:
            staged_path = self._stage_input(pages, input_snapshot)
            staged = self.spark.read.parquet(staged_path)
            present = self._list_staged_buckets(staged_path)
        else:
            staged = pages.withColumn(
                "url_bucket",
                F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int"),
            )
            present = list(range(self.n_buckets))
        done_set = self._done_buckets(input_snapshot)
        todo_buckets = [b for b in present if b not in done_set]

        waves = [
            todo_buckets[i : i + wave_size]
            for i in range(0, len(todo_buckets), wave_size)
        ]
        if max_waves is not None:
            waves = waves[:max_waves]
        for wave in waves:
            self._run_wave(staged, wave, run_id, input_snapshot)

        # summary row count = rows in THIS SNAPSHOT's output partitions
        # (metrics history is append-only and would double-count a
        # reprocessed bucket; the output partitions are the truth).  One
        # partition-pruned count at job end, not per wave.
        try:
            n_out = (
                self.io.read(
                    self.spark, self.output_dir,
                    schema=self._output_schema_ddl(),
                )
                .where(F.col("input_snapshot") == input_snapshot)
                .count()
            )
        except Exception:
            n_out = 0
        return {
            "run_id": run_id,
            "buckets_done_before": len(done_set),
            "buckets_processed": sum(len(w) for w in waves),
            "waves": len(waves),
            "rows_in_output": n_out,
        }

    def apply_patch(
        self, patch: DataFrame, input_snapshot: str = "static"
    ) -> dict:
        """Incremental PATCH of a completed snapshot (X8 twin — the
        reference's edit surface mutates a workbook and re-extracts;
        the lakehouse analogue is upsert-then-refresh): ``patch`` rows
        (same pages schema) REPLACE same-url rows / ADD new urls, and
        only the AFFECTED url-hash buckets are re-extracted.

        Mechanics: patched urls hash to their buckets (the same pmod
        key as staging), the staged table's affected partitions are
        rewritten as (old rows anti-join patched urls) UNION patch —
        materialized via localCheckpoint BEFORE the write so the
        dynamic partition overwrite never reads the files it replaces —
        then `_run_wave` re-extracts exactly those buckets into the
        same output partitions (dynamic overwrite keeps every other
        bucket byte-untouched).  Cost at 100 TB: proportional to the
        patch's bucket count, never a full-corpus rescan; the affected
        bucket list is a bounded driver collect (<= n_buckets).
        Lineage gains a new run's 'done' rows for the refreshed
        buckets; `_done_buckets` reads distinct, so resume semantics
        are unchanged.  GRAIN: the refresh unit is the bucket — a patch
        scattered across all buckets degenerates to a full refresh, so
        size ``n_buckets`` for the patch regime (4096+ at corpus scale
        keeps a few-thousand-url patch under a percent of the data;
        measured 4.6x at 96k docs / 64 buckets, BENCH round-4)."""
        staged_path = self._staged_path(input_snapshot)
        fs, hpath = self._fs(staged_path + "/_SUCCESS")
        if not fs.exists(hpath):
            raise ValueError(
                f"no completed staging for snapshot {input_snapshot!r} — "
                "patch requires a prior run(stage_input=True)"
            )
        run_id = uuid.uuid4().hex[:12]
        bucketed = patch.withColumn(
            "url_bucket",
            F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int"),
        )
        affected = sorted(
            r["url_bucket"]
            for r in bucketed.select("url_bucket").distinct().collect()
        )
        n_patch = bucketed.count()
        staged = self.spark.read.parquet(staged_path)
        base = staged.where(F.col("url_bucket").isin(affected))
        merged = (
            base.join(bucketed.select("url"), "url", "left_anti")
            .unionByName(bucketed)
            .localCheckpoint()
        )
        conf = self.spark.conf
        key = "spark.sql.sources.partitionOverwriteMode"
        old = conf.get(key, None)
        conf.set(key, "dynamic")
        try:
            (merged.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("url_bucket").parquet(staged_path))
        finally:
            if old is None:
                conf.unset(key)
            else:
                conf.set(key, old)
        fresh = self.spark.read.parquet(staged_path)
        self._run_wave(fresh, affected, run_id, input_snapshot)
        return {
            "run_id": run_id,
            "patched_urls": n_patch,
            "buckets_refreshed": affected,
        }

    def apply_cell_edits(
        self, edits: dict, input_snapshot: str = "static"
    ) -> dict:
        """Cell-level edit surface (X8 residual, VERDICT r4 #4): the
        reference's typed op family (edit/types.py:7-29 — set_value,
        set_fill_color, ... with applied/skipped statuses) compiled
        onto ``apply_patch``'s bucket-scoped refresh.

        ``edits`` maps url -> op list (``kernels/edits.py`` dicts, e.g.
        ``{"op": "set_value", "table": 0, "row": 1, "col": 2,
        "value": 9.5}``).  The staged documents are patched by pure
        HTML-splicing functions inside one Arrow batch stage, then the
        standard patch path re-extracts ONLY the affected buckets —
        untouched buckets stay byte-identical, and the edited documents
        flow through the exact extraction every other document gets.

        An editing-session surface, not a bulk path: the edit set is
        driver-bounded (url list broadcast; per-op statuses collected
        back — the reference's PatchResult analogue).  Documents are
        UTF-8 re-encoded on edit (the reference's editor likewise
        rewrites its container).  Returns apply_patch's summary plus
        ``op_status`` per url and ``missing_urls`` (edits addressed at
        urls the snapshot does not contain — the whole-url analogue of
        a skipped op)."""
        import json as _json

        from pyspark.sql import types as T

        from exstruct_spark.kernels.dom import decode_html_bytes
        from exstruct_spark.kernels.edits import apply_ops

        staged_path = self._staged_path(input_snapshot)
        fs, hpath = self._fs(staged_path + "/_SUCCESS")
        if not fs.exists(hpath):
            raise ValueError(
                f"no completed staging for snapshot {input_snapshot!r} — "
                "cell edits require a prior run(stage_input=True)"
            )
        urls = sorted(edits)
        ops_json = {u: _json.dumps(list(ops)) for u, ops in edits.items()}
        bc = self.spark.sparkContext.broadcast(ops_json)
        base = (
            self.spark.read.parquet(staged_path)
            .where(F.col("url").isin(urls))
            .drop("url_bucket")
        )
        out_schema = T.StructType(
            list(base.schema.fields)
            + [T.StructField("op_status", T.StringType())]
        )

        def patch_batches(batches: Iterator[pd.DataFrame]):
            ops_map = bc.value
            for pdf in batches:
                htmls = []
                statuses = []
                for url, hb in zip(pdf["url"], pdf["html"]):
                    text = decode_html_bytes(
                        bytes(hb) if hb is not None else b"")
                    new, st = apply_ops(text, _json.loads(ops_map[url]))
                    htmls.append(bytearray(new.encode("utf-8")))
                    statuses.append(_json.dumps(st))
                out = pdf.copy()
                out["html"] = htmls
                out["op_status"] = statuses
                yield out

        patched = base.mapInPandas(
            patch_batches, schema=out_schema).localCheckpoint()
        status_rows = patched.select("url", "op_status").collect()
        summary = self.apply_patch(
            patched.drop("op_status"), input_snapshot)
        summary["op_status"] = {
            r["url"]: _json.loads(r["op_status"]) for r in status_rows
        }
        summary["missing_urls"] = sorted(
            set(urls) - {r["url"] for r in status_rows})
        return summary
