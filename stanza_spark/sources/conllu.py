"""CoNLL-U codec (SURVEY §2.2 I1-I3): read fixture files into the flat
words schema, render annotated words back to CoNLL-U text.

Format per the reference implementation (/root/reference/stanza/utils/
conll.py:19-124: 10 tab-separated fields, ``#`` comment lines, ``n-m``
multi-word-token ranges) with the reference's misc extensions
(``start_char=..|end_char=..|ner=..``, doc.py:1003-1124 and the golden
rendering in tests/pipeline/test_english_pipeline.py:89-122).

Reading is a driver-side fixture utility (test corpora are small); writing
is a pure Spark aggregation over the words table — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FIELDS = ["id", "form", "lemma", "upos", "xpos", "feats",
          "head", "deprel", "deps", "misc"]


def parse_conllu(text: str):
    """CoNLL-U text -> list of sentence dicts
    {doc_id, sent_id, text, words: [field dicts]}.  MWT ranges (``n-m``)
    become the token grouping; empty nodes (``n.m``) are skipped like the
    reference's gapping filter (conll.py:43-44)."""
    docs = []
    cur_doc = None
    sent_words, sent_meta = [], {}

    def flush_sentence():
        nonlocal sent_words, sent_meta
        if sent_words:
            cur_doc["sentences"].append(
                {"meta": sent_meta, "words": sent_words})
        sent_words, sent_meta = [], {}

    def new_doc(doc_id):
        nonlocal cur_doc
        cur_doc = {"doc_id": doc_id, "sentences": []}
        docs.append(cur_doc)

    new_doc("doc0")
    mwt_range, mwt_form = None, None
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line.strip():
            flush_sentence()
            continue
        if line.startswith("#"):
            if "=" in line:
                k, v = line[1:].split("=", 1)
                k, v = k.strip(), v.strip()
                if k in ("newdoc id", "doc_id"):
                    flush_sentence()
                    if cur_doc["sentences"] or sent_words:
                        new_doc(v)
                    else:
                        cur_doc["doc_id"] = v
                else:
                    sent_meta[k] = v
            continue
        cols = line.split("\t")
        if len(cols) != 10:
            continue
        wid = cols[0]
        if "." in wid:
            continue  # empty (enhanced-only) node
        if "-" in wid:
            a, b = wid.split("-")
            mwt_range, mwt_form = (int(a), int(b)), cols[1]
            continue
        w = dict(zip(FIELDS, cols))
        w["id"] = int(wid)
        if mwt_range and mwt_range[0] <= w["id"] <= mwt_range[1]:
            w["mwt_form"] = mwt_form
            w["is_mwt"] = True
            if w["id"] == mwt_range[1]:
                mwt_range, mwt_form = None, None
        else:
            w["is_mwt"] = False
        sent_words.append(w)
    flush_sentence()
    return [d for d in docs if d["sentences"]]


def read_conllu(spark: SparkSession, path: str) -> DataFrame:
    """Fixture file -> DataFrame in (a subset of) the words schema."""
    with open(path) as f:
        docs = parse_conllu(f.read())
    rows = []
    for d in docs:
        for sid, s in enumerate(d["sentences"]):
            for w in s["words"]:
                rows.append((d["doc_id"], sid, w["id"], bool(w["is_mwt"]),
                             w["form"], w["lemma"], w["upos"], w["xpos"],
                             w["feats"], int(w["head"]), w["deprel"],
                             w["misc"]))
    return spark.createDataFrame(rows, schema=(
        "url string, sent_id int, word_id int, is_mwt boolean, text string, "
        "lemma string, upos string, xpos string, feats string, head int, "
        "deprel string, misc string"))


def render_conllu(words: DataFrame, include_meta: bool = True) -> DataFrame:
    """words (annotate.WORDS_SCHEMA) -> one row per sentence:
    (url, sent_id, conllu string) — rendering is pure Spark SQL:
    per-word line via concat, per-sentence assembly via sorted
    collect_list + array_join (misc carries the reference's
    start_char/end_char/ner extensions)."""
    line = F.concat_ws(
        "\t",
        F.col("word_id").cast("string"), F.col("text"), F.col("lemma"),
        F.col("upos"), F.col("xpos"), F.col("feats"),
        F.col("head").cast("string"), F.col("deprel"), F.lit("_"),
        F.concat(
            F.lit("start_char="), F.col("start_char").cast("string"),
            F.lit("|end_char="), F.col("end_char").cast("string"),
            F.lit("|ner="), F.col("ner")),
    )
    per_sent = (
        words.withColumn("line", line)
        .groupBy("url", "sent_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "line"))),
                    lambda s: s["line"]),
                "\n").alias("body"),
            F.min("sent_start").alias("ss"),
            F.min("sent_end").alias("se"),
        )
    )
    if include_meta:
        header = F.concat(F.lit("# sent_id = "),
                          F.col("sent_id").cast("string"), F.lit("\n"))
        return per_sent.select(
            "url", "sent_id",
            F.concat(header, F.col("body"), F.lit("\n")).alias("conllu"))
    return per_sent.select("url", "sent_id",
                           F.concat(F.col("body"), F.lit("\n")).alias("conllu"))
