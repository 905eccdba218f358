"""Sentence split + tokenization as *pure Spark SQL* (JVM fast path for
ops 8-12 when char offsets aren't needed).

`sentences_from_pages` derives sentence rows with doc-level char offsets
using only built-in functions; `tokens_sql` explodes RE tokens with
`regexp_extract_all` + `posexplode` — whole-stage codegen end to end, no
Python.  The Arrow annotator (operators.annotate) produces the same token
stream with offsets; parity between the two paths is asserted in tests.

The sentence rule matches the annotator: a sentence ends after a [.!?]
(or CJK 。！？) token; URLs/emails are single tokens first so dots inside
them never split.  The SQL path uses the RE2/Java-safe vocab.URL_RE/
EMAIL_RE twins of the reference's MASK_RE (tokenization/utils.py:199-248);
the Arrow annotator applies the verbatim-semantics reference regexes —
the two agree on every corpus form and on realistic web text (asserted in
tests), diverging only on documented pathologies (hosts starting 'www'
without a dot, quoted-string email local parts).
"""

from __future__ import annotations

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from .. import vocab as V
from .annotate import split_sentences

SENTS_SCHEMA = ("url string, lang string, sent_id int, text string, "
                "start_char bigint, end_char bigint")


def _ssplit_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            for sid, (a, b, _toks) in enumerate(split_sentences(text)):
                out.append((url, lang, sid, text[a:b], a, b))
        yield pd.DataFrame(
            out, columns=["url", "lang", "sent_id", "text",
                          "start_char", "end_char"])


def sentences_from_pages(pages_df: DataFrame) -> DataFrame:
    """pages -> (url, lang, sent_id, text, start_char, end_char); narrow
    Arrow pass (token-stream-driven split, byte-exact offsets)."""
    return pages_df.select("url", "lang", "text").mapInPandas(
        _ssplit_batches, schema=SENTS_SCHEMA)


def tokens_sql(sentences_df: DataFrame) -> DataFrame:
    """sentences -> (url, lang, sent_id, token_id, token) via
    regexp_extract_all + posexplode: zero Python."""
    return sentences_df.select(
        "url", "lang", "sent_id",
        F.posexplode(
            F.regexp_extract_all("text", F.lit(V.TOKEN_RE), 0)
        ).alias("pos", "token"),
    ).select(
        "url", "lang", "sent_id",
        (F.col("pos") + 1).alias("token_id"), "token",
    )
