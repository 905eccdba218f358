"""Decode-kernel gates: Chu-Liu/Edmonds single-root MST + Viterbi
(operators.decode) — anchored on the reference's documented cases
(/root/reference/stanza/models/common/chuliu_edmonds.py:15-29,246-269;
crf.py:107-130), brute-force-verified on random matrices, and shown to
resolve inputs the fixed grammar cannot (cycles, non-projectivity,
multi-verb sentences, invalid greedy tag sequences)."""

import itertools

import numpy as np
import pytest

from stanza_spark.operators.decode import (
    NER_TAGS, NER_TRANS, chuliu_edmonds, find_cycles, grammar_arc_scores,
    mst_single_root, parse_sentence_mst, tag_ner_viterbi, viterbi_decode)


# ---------------------------------------------------------------------------
# cycle finder: the reference's documented tarjan cases
# ---------------------------------------------------------------------------

def test_find_cycles_reference_cases():
    """chuliu_edmonds.py:15-29 docstring examples."""
    assert find_cycles(np.array([0, 4, 4, 4, 0])) == []
    assert find_cycles(np.array([0, 2, 0, 4, 2, 2])) == []
    got = find_cycles(np.array([0, 3, 1, 2]))
    assert len(got) == 1
    assert got[0].tolist() == [False, True, True, True]
    # two disjoint cycles (reference test_chuliu_edmonds.py::test_tarjan_cycle)
    got = find_cycles(np.array([0, 3, 1, 2, 5, 6, 4]))
    assert sorted(m.tolist() for m in got) == [
        [False, False, False, False, True, True, True],
        [False, True, True, True, False, False, False]]


# ---------------------------------------------------------------------------
# MST: brute-force verification
# ---------------------------------------------------------------------------

def _all_trees(n, single_root):
    for heads in itertools.product(range(n), repeat=n - 1):
        h = (0,) + heads
        if any(h[i] == i for i in range(1, n)):
            continue
        if single_root and sum(1 for i in range(1, n) if h[i] == 0) != 1:
            continue
        ok = True
        for i in range(1, n):
            seen, v = set(), i
            while v != 0:
                if v in seen:
                    ok = False
                    break
                seen.add(v)
                v = h[v]
            if not ok:
                break
        if ok:
            yield h


def _tree_score(scores, heads):
    return sum(scores[i, heads[i]] for i in range(1, len(heads)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chuliu_edmonds_matches_brute_force(seed):
    rnd = np.random.RandomState(seed)
    for _ in range(40):
        n = rnd.randint(2, 6)
        scores = -rnd.uniform(0, 10, size=(n, n))
        got = chuliu_edmonds(scores.copy())
        assert got[0] == 0
        best = max(_tree_score(scores, h) for h in _all_trees(n, False))
        assert _tree_score(scores, got) == pytest.approx(best)


@pytest.mark.parametrize("seed", [3, 4])
def test_single_root_matches_constrained_brute_force(seed):
    rnd = np.random.RandomState(seed)
    for _ in range(40):
        n = rnd.randint(2, 6)
        scores = -rnd.uniform(0, 10, size=(n, n))
        got = mst_single_root(scores)
        assert int(np.count_nonzero(got[1:] == 0)) == 1
        best = max(_tree_score(scores, h) for h in _all_trees(n, True))
        assert _tree_score(scores, got) == pytest.approx(best)


def test_single_root_constraint_changes_the_tree():
    """Two strong root arcs: plain CLE takes both (a forest the parser
    contract forbids); the one-root reweighting keeps exactly one
    (chuliu_edmonds.py:246-269 / Stanojević & Cohen 2021)."""
    s = np.array([
        [0.0, -9, -9, -9],
        [0.0, -9, -9, -9],   # w1 wants ROOT
        [-0.5, -9, -9, -9],  # w2 also wants ROOT
        [-9, -9, -1, -9],    # w3 -> w2
    ])
    plain = chuliu_edmonds(s.copy())
    assert int(np.count_nonzero(plain[1:] == 0)) == 2
    one = mst_single_root(s)
    assert one.tolist() == [0, 0, 1, 2]  # w2 re-attaches under w1


def test_mst_resolves_greedy_cycle():
    """Per-row argmax forms a 1<->2 cycle; the contraction machinery must
    break it at the cheapest point — the fixed grammar has no notion of
    this input at all."""
    s = np.array([
        [0.0, -9, -9, -9],
        [-5.0, -9, -1, -9],   # w1 -> w2   (cycle)
        [-6.0, -1, -9, -9],   # w2 -> w1   (cycle)
        [-9, -2, -9, -9],     # w3 -> w1
    ])
    got = mst_single_root(s)
    assert int(np.count_nonzero(got[1:] == 0)) == 1
    assert find_cycles(got) == []
    best = max(_tree_score(s, h) for h in _all_trees(4, True))
    assert _tree_score(s, got) == pytest.approx(best)


def test_mst_returns_non_projective_tree():
    """Crossing arcs (1,3) x (2,4): a maximum arborescence is naturally
    non-projective-capable; assert the crossing optimum is returned
    verbatim."""
    want = [0, 0, 1, 1, 2]   # h(w3)=w1 spans 1-3; h(w4)=w2 spans 2-4
    s = np.full((5, 5), -10.0)
    for dep, head in enumerate(want):
        if dep:
            s[dep, head] = 0.0
    got = mst_single_root(s)
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# Viterbi
# ---------------------------------------------------------------------------

def _viterbi_brute(em, tr):
    T, K = em.shape
    best, path = -np.inf, None
    for p in itertools.product(range(K), repeat=T):
        sc = em[0, p[0]] + sum(tr[p[t - 1], p[t]] + em[t, p[t]]
                               for t in range(1, T))
        if sc > best:
            best, path = sc, list(p)
    return path, best


def test_viterbi_matches_brute_force():
    rnd = np.random.RandomState(7)
    for _ in range(60):
        T, K = rnd.randint(1, 6), rnd.randint(2, 5)
        em = rnd.uniform(-5, 5, size=(T, K))
        tr = rnd.uniform(-5, 5, size=(K, K))
        path, score = viterbi_decode(em, tr)
        bpath, bscore = _viterbi_brute(em, tr)
        assert score == pytest.approx(bscore)
        assert path == bpath


def test_viterbi_repairs_invalid_greedy_sequence():
    """Greedy per-token argmax yields [B-PERSON, O] — invalid BIOES the
    rule tagger could never repair; Viterbi under NER_TRANS closes the
    entity instead."""
    i_b, i_e, i_o = (NER_TAGS.index("B-PERSON"), NER_TAGS.index("E-PERSON"),
                     NER_TAGS.index("O"))
    em = np.full((2, len(NER_TAGS)), -20.0)
    em[0, i_b] = 0.0
    em[0, i_o] = -8.0
    em[1, i_o] = 0.0
    em[1, i_e] = -3.0
    greedy = [int(np.argmax(em[0])), int(np.argmax(em[1]))]
    assert greedy == [i_b, i_o]          # the invalid sequence
    path, _ = viterbi_decode(em, NER_TRANS)
    assert [NER_TAGS[p] for p in path] == ["B-PERSON", "E-PERSON"]


# ---------------------------------------------------------------------------
# default scorers: MST/Viterbi paths reproduce the grammar on in-grammar
# sentences and stay valid beyond it
# ---------------------------------------------------------------------------

def _words_for(text):
    from stanza_spark.operators.annotate import (expand_token,
                                                 split_sentences, tag_word)
    sents = []
    for (_a, _b, toks) in split_sentences(text):
        words = []
        for (tok, _s, _e) in toks:
            for p in expand_token(tok):
                upos, xpos, feats, lemma = tag_word(p)
                words.append({"text": p, "upos": upos, "xpos": xpos,
                              "lemma": lemma})
        sents.append(words)
    return sents


GOLDEN = ("Barack Obama was born in Hawaii. He was elected president in "
          "2008. Obama attended Harvard. Globex Corporation is based in "
          "Berlin. See https://example.org/kb/7.html for details.")


def test_mst_path_reproduces_grammar_on_golden():
    from stanza_spark.operators.annotate import parse_sentence, tag_ner
    for words in _words_for(GOLDEN):
        w2 = [dict(w) for w in words]
        parse_sentence(words)
        parse_sentence_mst(w2)
        assert ([(w["head"], w["deprel"]) for w in words]
                == [(w["head"], w["deprel"]) for w in w2])
        assert tag_ner_viterbi(w2) == tag_ner(w2)


def test_mst_path_fixes_multi_verb_forest():
    """'Obama founded Initech and see Hooli.' has two VERBs: the grammar
    leaves the second verb headless (head 0 => a two-root forest); the
    single-root MST attaches it under the main predicate and the output
    is a valid tree."""
    from stanza_spark.operators.annotate import parse_sentence
    words = _words_for("Obama founded Initech and see Hooli.")[0]
    assert sum(1 for w in words if w["upos"] == "VERB") == 2
    gram = [dict(w) for w in words]
    parse_sentence(gram)
    assert sum(1 for w in gram if w["head"] == 0) == 2   # the forest
    parse_sentence_mst(words)
    heads = [w["head"] for w in words]
    assert heads.count(0) == 1                            # single root
    assert find_cycles(np.array([0] + heads)) == []       # valid tree
    root = heads.index(0)
    assert words[root]["text"] == "founded"
    see = next(i for i, w in enumerate(words) if w["text"] == "see")
    assert heads[see] == root + 1


def test_pluggable_scorer_with_cycle():
    """A plugged-in scorer whose greedy argmax is cyclic still decodes to
    a valid labeled tree through the same parse_sentence_mst entry."""
    words = _words_for("Obama attended Harvard.")[0]

    def cyclic_scorer(ws):
        n = len(ws)
        s = np.full((n + 1, n + 1), -30.0)
        s[1, 2] = -1.0   # w1 -> w2
        s[2, 1] = -1.0   # w2 -> w1 (greedy cycle)
        s[1, 0] = -5.0
        s[2, 0] = -6.0
        for i in range(3, n + 1):
            s[i, 1] = -2.0
        return s

    parse_sentence_mst(words, scorer=cyclic_scorer)
    heads = [w["head"] for w in words]
    assert heads.count(0) == 1
    assert find_cycles(np.array([0] + heads)) == []
    assert all(w["deprel"] for w in words)


def test_grammar_arc_scores_are_log_scores():
    """mst_single_root's reweighting assumes scores <= 0."""
    for words in _words_for(GOLDEN):
        assert float(grammar_arc_scores(words).max()) <= 0.0


@pytest.mark.parametrize("seed", [5, 6])
def test_single_root_handles_nonnegative_scores(seed):
    """Arbitrary score matrices, not just log-scores: positive and
    all-zero inputs must still decode to the optimal single-root tree
    (ADVICE r3 — the old reweighting was a no-op when min_finite >= 0)."""
    rnd = np.random.RandomState(seed)
    for _ in range(40):
        n = rnd.randint(2, 6)
        scores = rnd.uniform(0, 10, size=(n, n))   # strictly positive
        got = mst_single_root(scores.copy())
        assert int(np.count_nonzero(got[1:] == 0)) == 1
        best = max(_tree_score(scores, h) for h in _all_trees(n, True))
        assert _tree_score(scores, got) == pytest.approx(best)


def test_single_root_all_equal_scores():
    """Fully degenerate matrix: every tree ties.  Any single-root tree is
    optimal; the decode must return one instead of raising."""
    for n in (2, 3, 5):
        s = np.zeros((n, n))
        got = mst_single_root(s)
        assert int(np.count_nonzero(got[1:] == 0)) == 1
        assert find_cycles(got) == []
