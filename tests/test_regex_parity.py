"""Property-based cross-engine regex parity (hypothesis): the shared
tokenization regexes must behave identically under Python `re` (the Arrow
annotator), DuckDB's RE2 (the oracle) and — by the corpus gates — Spark's
java.util.regex.  Catches any accidental introduction of engine-specific
constructs (lookarounds, possessives, class subtleties)."""

import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from stanza_spark import vocab as V

TOKEN_PAT = re.compile(V.TOKEN_RE)
CON = duckdb.connect()

text_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm", "Sc"),
        whitelist_characters=".!?@:/#'\"-_()<>&%数据报告。",
    ),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_token_regex_python_vs_duckdb(s):
    py = TOKEN_PAT.findall(s)
    duck = CON.execute(
        "SELECT regexp_extract_all(?, ?)", [s, V.TOKEN_RE]).fetchone()[0]
    assert py == duck


@settings(max_examples=200, deadline=None)
@given(st.from_regex(V.URL_RE, fullmatch=True))
def test_url_regex_roundtrip(url):
    # any URL_RE match embedded in text must come back as one token
    s = f"see {url} now"
    toks = TOKEN_PAT.findall(s)
    assert url in toks


WS_CHARS = "\t\n\r\x0b\x0c \u0085\u00a0\u1680\u2000\u2028\u2029\u3000"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from("ab7" + WS_CHARS), max_size=60))
def test_ws_split_python_vs_duckdb(s):
    """vocab.WS_SPLIT_RE (the literal whitespace class replacing `\\s+`)
    must split identically in python-re and DuckDB RE2 — incl. the
    characters where `\\s` itself diverges across engines (\\x0B, NBSP,
    C1 controls)."""
    py = re.split(V.WS_SPLIT_RE, s)
    duck = CON.execute(
        "SELECT regexp_split_to_array(?, ?)",
        [s, V.WS_SPLIT_RE]).fetchone()[0]
    assert py == duck


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(
    "ab .@" + "\U0001F600\U0001F680\u2705\u2764\ufe0f\u200d"), max_size=40))
def test_emoji_cleanup_python_vs_duckdb(s):
    """The langid emoji codepoint-class must strip the same spans in both
    engines (python `re` needs the `\\x{..}` escapes translated — the
    operator itself runs only on Spark/DuckDB, so the python twin here
    rebuilds the class from literal ranges)."""
    from stanza_spark.operators.textstats import LANGID_CLEANUP_RES
    pat = LANGID_CLEANUP_RES[-1]
    py_pat = re.sub(r"\\x\{([0-9A-Fa-f]+)\}",
                    lambda m: re.escape(chr(int(m.group(1), 16))), pat)
    py = re.sub(py_pat, " ", s)
    duck = CON.execute(
        "SELECT regexp_replace(?, ?, ' ', 'g')", [s, pat]).fetchone()[0]
    assert py == duck
