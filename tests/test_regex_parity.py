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
