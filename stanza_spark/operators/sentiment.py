"""Sentiment-lite (SURVEY §2.1 op 19): per-sentence 3-class label.

The reference classifies each sentence with a CNN batched at 5000 words
(/root/reference/stanza/pipeline/sentiment_processor.py:33,72-78); labels
are 0=negative 1=neutral 2=positive.  The deterministic stand-in is a
lexicon vote — pure Spark SQL over the sentence table (higher-order array
functions, no UDF, no shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import vocab as V


def sentence_sentiment(sentences_df: DataFrame) -> DataFrame:
    """sentences(url, sent_id, text, ...) -> + sentiment int (0/1/2)."""
    words = F.split(F.lower(F.col("text")), "[^a-z]+")
    pos = F.size(F.filter(words, lambda w: w.isin(V.SENTIMENT_POS)))
    neg = F.size(F.filter(words, lambda w: w.isin(V.SENTIMENT_NEG)))
    return sentences_df.withColumn(
        "sentiment",
        F.when(pos > neg, F.lit(2)).when(neg > pos, F.lit(0)).otherwise(F.lit(1)),
    )
