"""The ``pages`` source table (url, warc_ts, html, text, lang).

Shape fixed by BASELINE.json ``input_hint``.  Content is synthesized
deterministically from the driver's ``documents`` parquet (doc_id/source/lang
drive pure modular arithmetic — see :mod:`stanza_spark.synth`), entirely with
JVM-side Catalyst expressions: no UDF, no RNG, no external data.

``html`` is a binary column wrapping ``text`` in deterministic boilerplate
(nav/script/footer) so that boilerplate-stripping (`operators.html`) is a
real, byte-exact-testable stage (north rule: byte-identical extracted text
per url).  At 100 TB this generation is embarrassingly parallel and
shuffle-free: one narrow projection per input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..synth import Dialect, pages_text_expr, url_expr
from ..operators.html import wrap_html_expr

_SPARK = Dialect("spark")

WARC_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages(spark: SparkSession, sf_dir: str, with_html: bool = True,
          n_partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) + doc_id carried for tests.

    The local documents parquet is one input split — useless parallelism
    for the downstream narrow chain.  Repartition to core count (a real
    Common-Crawl corpus arrives in thousands of splits; this stands in
    for that).  Everything after the repartition is narrow.  ONE wave of
    cores (r7; was 2x): every task pays a fixed Python-boundary cost in
    the Arrow annotate passes (worker round-trip + batch plumbing —
    measured ~0.3s/query of pure task overhead at 2x), docs are
    uniform-sized so the second wave bought no balance, and at cluster
    scale split count comes from the file layout anyway (guide §6
    maxPartitionBytes), not from this simulation knob.
    """
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    df = documents(spark, sf_dir).repartition(n_partitions, "doc_id").selectExpr(
        "doc_id",
        f"{url_expr(_SPARK)} AS url",
        f"timestamp_seconds({WARC_EPOCH} + doc_id * 37 % 31536000) AS warc_ts",
        f"{pages_text_expr(_SPARK)} AS text",
        "lang",
    )
    if with_html:
        df = df.withColumn("html", wrap_html_expr(F.col("text"), F.col("doc_id")))
    return df.select("doc_id", "url", "warc_ts",
                     *( ["html"] if with_html else [] ), "text", "lang")
