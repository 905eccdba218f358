"""Annotator-core tests anchored to the reference's golden fixtures
(/root/reference/stanza/tests/pipeline/test_english_pipeline.py:16-122 and
test_pipeline_ner_processor.py:14-41). Pure Python — no Spark session."""

from stanza_spark.operators.annotate import (
    annotate_page, split_sentences, tag_ner, expand_token,
)

# the reference's golden document (test_english_pipeline.py:16)
EN_DOC = ("Barack Obama was born in Hawaii.  He was elected president in "
          "2008.  Obama attended Harvard.")

# (sent, word_id, text, lemma, upos, xpos, head, deprel, ner, start, end)
# transcribed from EN_DOC_CONLLU_GOLD (test_english_pipeline.py:89-122)
GOLD = [
    (0, 1, "Barack", "Barack", "PROPN", "NNP", 4, "nsubj:pass", "B-PERSON", 0, 6),
    (0, 2, "Obama", "Obama", "PROPN", "NNP", 1, "flat", "E-PERSON", 7, 12),
    (0, 3, "was", "be", "AUX", "VBD", 4, "aux:pass", "O", 13, 16),
    (0, 4, "born", "bear", "VERB", "VBN", 0, "root", "O", 17, 21),
    (0, 5, "in", "in", "ADP", "IN", 6, "case", "O", 22, 24),
    (0, 6, "Hawaii", "Hawaii", "PROPN", "NNP", 4, "obl", "S-GPE", 25, 31),
    (0, 7, ".", ".", "PUNCT", ".", 4, "punct", "O", 31, 32),
    (1, 1, "He", "he", "PRON", "PRP", 3, "nsubj:pass", "O", 34, 36),
    (1, 2, "was", "be", "AUX", "VBD", 3, "aux:pass", "O", 37, 40),
    (1, 3, "elected", "elect", "VERB", "VBN", 0, "root", "O", 41, 48),
    (1, 4, "president", "president", "NOUN", "NN", 3, "xcomp", "O", 49, 58),
    (1, 5, "in", "in", "ADP", "IN", 6, "case", "O", 59, 61),
    (1, 6, "2008", "2008", "NUM", "CD", 3, "obl", "S-DATE", 62, 66),
    (1, 7, ".", ".", "PUNCT", ".", 3, "punct", "O", 66, 67),
    (2, 1, "Obama", "Obama", "PROPN", "NNP", 2, "nsubj", "S-PERSON", 69, 74),
    (2, 2, "attended", "attend", "VERB", "VBD", 0, "root", "O", 75, 83),
    (2, 3, "Harvard", "Harvard", "PROPN", "NNP", 2, "obj", "S-ORG", 84, 91),
    (2, 4, ".", ".", "PUNCT", ".", 2, "punct", "O", 91, 92),
]


def test_reference_golden_document():
    rows = annotate_page("u", "en", EN_DOC)
    assert len(rows) == len(GOLD)
    for r, g in zip(rows, GOLD):
        got = (r[2], r[6], r[8], r[14], r[11], r[12], r[15], r[16], r[17],
               r[9], r[10])
        assert got == (g[0], g[1], g[2], g[3], g[4], g[5], g[6], g[7], g[8],
                       g[9], g[10]), f"\n got={got}\nwant={g}"


def test_golden_feats():
    rows = annotate_page("u", "en", EN_DOC)
    by = {(r[2], r[8]): r[13] for r in rows}
    # exact feats strings from EN_DOC_CONLLU_GOLD
    assert by[(0, "Barack")] == "Number=Sing"
    assert by[(0, "was")] == "Mood=Ind|Number=Sing|Person=3|Tense=Past|VerbForm=Fin"
    assert by[(0, "born")] == "Tense=Past|VerbForm=Part|Voice=Pass"
    assert by[(1, "He")] == "Case=Nom|Gender=Masc|Number=Sing|Person=3|PronType=Prs"
    assert by[(1, "2008")] == "NumForm=Digit|NumType=Card"


def test_sentence_split_offsets():
    sents = split_sentences(EN_DOC)
    assert [(a, b) for a, b, _ in sents] == [(0, 32), (34, 67), (69, 92)]
    assert EN_DOC[34:67] == "He was elected president in 2008."


def test_url_is_single_token_and_never_splits_sentence():
    text = "See https://example.org/kb/7.html for details. It works."
    sents = split_sentences(text)
    assert len(sents) == 2
    toks = [t for t, _, _ in sents[0][2]]
    assert "https://example.org/kb/7.html" in toks


def test_email_single_token():
    sents = split_sentences("Mail bob.smith+x@example.co.uk now.")
    toks = [t for t, _, _ in sents[0][2]]
    assert "bob.smith+x@example.co.uk" in toks


def test_cjk_sentence_end():
    sents = split_sentences("数据 报告 于 1957 年 发布 。 数据 报告 于 1986 年 发布 。")
    assert len(sents) == 2


def test_mwt_expansion():
    assert expand_token("can't") == ["ca", "n't"]
    assert expand_token("Don't") == ["Do", "n't"]
    assert expand_token("it's") == ["it", "'s"]
    assert expand_token("plain") == ["plain"]
    rows = annotate_page("u", "en", "She can't go.")
    # token 2 -> two words sharing token_id, flagged MWT
    mwt = [r for r in rows if r[7]]
    assert [(r[5], r[8]) for r in mwt] == [(2, "ca"), (2, "n't")]
    lemmas = {r[8]: r[14] for r in rows}
    assert lemmas["n't"] == "not" and lemmas["ca"] == "can"


def test_ner_closed_class_capitalized_excluded():
    # "He" / "The" capitalized must not become mentions (reference golden:
    # He -> ner O, test_english_pipeline.py:105)
    rows = annotate_page("u", "en", "He visited Paris.")
    ners = {r[8]: r[17] for r in rows}
    assert ners["He"] == "O"
    assert ners["Paris"] == "S-GPE"


def test_ner_single_unknown_cap_dropped_multi_kept():
    words = [{"text": t, "upos": "PROPN"} for t in ["Zorbly", "said", "hi"]]
    tags, mentions = tag_ner(words)
    assert tags == ["O", "O", "O"] and mentions == []
    words = [{"text": t, "upos": "PROPN"} for t in ["Zorbly", "Qux"]]
    tags, mentions = tag_ner(words)
    assert tags == ["B-MISC", "E-MISC"]


def test_offsets_are_byte_faithful_slices():
    text = "Marie Curie founded Initech in Paris. Costs rose 5% & more <fast> in 1999."
    rows = annotate_page("u", "en", text)
    for r in rows:
        if not r[7]:  # non-MWT words slice exactly
            assert text[r[9]:r[10]] == r[8]


def test_align_pretokenized():
    from stanza_spark.operators.annotate import align_pretokenized
    text = "Barack Obama  was born."
    toks = ["Barack", "Obama", "was", "born", "."]
    got = align_pretokenized(text, toks)
    assert got[1] == ("Obama", 7, 12)
    assert got[2] == ("was", 14, 17)  # double space skipped
    import pytest as _pytest
    with _pytest.raises(ValueError):
        align_pretokenized(text, ["Nope"])


def test_annotator_offsets_align_with_pretokenized_matcher():
    from stanza_spark.operators.annotate import align_pretokenized
    text = "Marie Curie founded Initech in Paris. See https://x.org/a.html now."
    rows = annotate_page("u", "en", text)
    toks = [r[8] for r in rows if not r[7]]
    aligned = align_pretokenized(text, toks)
    got = [(r[8], r[9], r[10]) for r in rows if not r[7]]
    assert got == aligned
