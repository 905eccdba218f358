"""CoNLL-U codec tests: golden rendering of the reference document
(field-level values from test_english_pipeline.py:89-122) and read
round-trip."""

from pyspark.sql import functions as F

from stanza_spark.operators.annotate import annotate
from stanza_spark.sources.conllu import render_conllu, parse_conllu

EN_DOC = ("Barack Obama was born in Hawaii.  He was elected president in "
          "2008.  Obama attended Harvard.")

# golden CoNLL-U body for sentence 2 (reference
# test_english_pipeline.py:116-122; SpaceAfter annotations not rendered)
GOLD_SENT2 = """1\tObama\tObama\tPROPN\tNNP\tNumber=Sing\t2\tnsubj\t_\tstart_char=69|end_char=74|ner=S-PERSON
2\tattended\tattend\tVERB\tVBD\tMood=Ind|Number=Sing|Person=3|Tense=Past|VerbForm=Fin\t0\troot\t_\tstart_char=75|end_char=83|ner=O
3\tHarvard\tHarvard\tPROPN\tNNP\tNumber=Sing\t2\tobj\t_\tstart_char=84|end_char=91|ner=S-ORG
4\t.\t.\tPUNCT\t.\t_\t2\tpunct\t_\tstart_char=91|end_char=92|ner=O"""


def test_render_matches_reference_golden(spark):
    df = spark.createDataFrame([("u", "en", EN_DOC)],
                               "url string, lang string, text string")
    out = render_conllu(annotate(df), include_meta=False) \
        .filter(F.col("sent_id") == 2).collect()
    assert out[0].conllu.rstrip("\n") == GOLD_SENT2


def test_parse_round_trip(spark):
    df = spark.createDataFrame([("u", "en", EN_DOC)],
                               "url string, lang string, text string")
    rendered = render_conllu(annotate(df)).orderBy("sent_id").collect()
    text = "# doc_id = u\n" + "\n".join(r.conllu for r in rendered)
    docs = parse_conllu(text)
    assert len(docs) == 1 and docs[0]["doc_id"] == "u"
    sents = docs[0]["sentences"]
    assert [len(s["words"]) for s in sents] == [7, 7, 4]
    w = sents[0]["words"][3]
    assert (w["form"], w["lemma"], w["upos"], w["head"], w["deprel"]) == \
        ("born", "bear", "VERB", "0", "root")


def test_parse_mwt_and_comments():
    text = """# doc_id = d1
# text = I can't go.
1\tI\tI\tPRON\tPRP\t_\t3\tnsubj\t_\t_
2-3\tcan't\t_\t_\t_\t_\t_\t_\t_\t_
2\tca\tcan\tAUX\tMD\t_\t3\taux\t_\t_
3\tn't\tnot\tPART\tRB\t_\t3\tadvmod\t_\t_
4\tgo\tgo\tVERB\tVB\t_\t0\troot\t_\t_
5\t.\t.\tPUNCT\t.\t_\t4\tpunct\t_\t_
"""
    docs = parse_conllu(text)
    ws = docs[0]["sentences"][0]["words"]
    assert [w["is_mwt"] for w in ws] == [False, True, True, False, False]
    assert ws[1]["mwt_form"] == "can't"
