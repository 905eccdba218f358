"""BIOES tag -> entity-span decode, in pure Spark SQL (op 14, SURVEY §2.1).

The reference decodes BIOES with a sequential per-sentence scan
(`decode_from_bioes`, /root/reference/stanza/models/ner/utils.py:218-264,
invoked by `Sentence.build_ents`, doc.py:823-835).  Relationally the same
thing is a classic gaps-and-islands problem: flag segment starts (B-/S-),
number segments with a running sum window, aggregate per segment.  This
stays entirely in whole-stage codegen — no Python.

The one shuffle (window partitioned by (url, sent_id)) is unavoidable for a
relational decode and reuses the same key every downstream join uses, so at
cluster scale the exchange is shared across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window


def decode_mentions(words: DataFrame) -> DataFrame:
    """words (annotate.WORDS_SCHEMA) -> mentions
    (url, sent_id, mention, type, start_char, end_char,
     first_word_id, last_word_id)."""
    tagged = words.filter(F.col("ner") != "O").select(
        "url", "sent_id", "word_id", "text", "start_char", "end_char",
        F.substring("ner", 1, 1).alias("pos_tag"),
        F.expr("substring(ner, 3)").alias("type"),
    )
    w = Window.partitionBy("url", "sent_id").orderBy("word_id")
    # A segment opens exactly where the reference's state machine starts a
    # new entity (ner/utils.py:218-264): on B-/S-, after an O gap (flush),
    # or right after an E-/S- (the previous span was closed) — so even
    # malformed sequences like B-E-E or I,O,I decode identically.
    prev_id = F.lag("word_id").over(w)
    prev_tag = F.lag("pos_tag").over(w)
    is_start = F.when(
        F.col("pos_tag").isin("B", "S")
        | prev_id.isNull()
        | (prev_id != F.col("word_id") - 1)
        | prev_tag.isin("E", "S"),
        1).otherwise(0)
    seg = tagged.withColumn("seg", F.sum(is_start).over(w))
    return (
        seg.groupBy("url", "sent_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("mention"),
            # type of the LAST tag in the segment — the reference's decode
            # overwrites cur_type per tag, so a malformed mixed-type span
            # resolves to its final tag's type (ner/utils.py:218-264)
            F.max_by("type", "word_id").alias("type"),
            F.min("start_char").alias("start_char"),
            F.max("end_char").alias("end_char"),
            F.min("word_id").alias("first_word_id"),
            F.max("word_id").alias("last_word_id"),
        )
        .drop("seg")
    )
