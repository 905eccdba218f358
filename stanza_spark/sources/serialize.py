"""Nested Document JSON serialization (SURVEY §2.2 I4): the analog of
``Document.to_dict`` — one JSON value per document, a list of sentences
each holding the word dicts in CoNLL field order
(/root/reference/stanza/models/common/doc.py:519-522,989-1001,1339).

Pure Spark: two aggregations on the url key (the partitioning every
annotation stage already carries) + ``to_json``; no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def documents_json(words: DataFrame) -> DataFrame:
    """words (annotate.WORDS_SCHEMA) -> (url, json): nested
    [[{id, text, lemma, upos, xpos, feats, head, deprel, start_char,
    end_char, ner}, ...], ...] per document."""
    word_struct = F.struct(
        F.col("word_id").alias("id"), F.col("text"), F.col("lemma"),
        F.col("upos"), F.col("xpos"), F.col("feats"), F.col("head"),
        F.col("deprel"), F.col("start_char"), F.col("end_char"),
        F.col("ner"))
    sents = (
        words.groupBy("url", "sent_id")
        .agg(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("word_id"), word_struct.alias("w")))),
            lambda s: s["w"]).alias("words"))
    )
    docs = (
        sents.groupBy("url")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("sent_id", "words"))),
            lambda s: s["words"]).alias("sentences"))
    )
    return docs.select("url", F.to_json("sentences").alias("json"))
