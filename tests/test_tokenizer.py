"""Golden-token tests pinning the tokenizer spec byte-for-byte
(FIXTURES.md §3; reference rules lexer.go:7-9, cacm.go:125-144,
document.go:61-64, vector_query.go:14-16,60-62)."""

from rechercheinfoweb_spark.functions.tokenizer import (
    STOPWORDS, bool_query_term, index_tokens, raw_tokens,
    vector_query_terms,
)

# (text, expected raw tokens, expected index tokens)
GOLDEN = [
    # charset: letters/digits plus ' - /
    ("don't stop-the-war tcp/ip",
     ["don't", "stop-the-war", "tcp/ip"],
     ["don't", "stop-the-war", "tcp/ip"]),
    # no lowercasing, stem len>3 only
    ("Running runs RUN run",
     ["Running", "runs", "RUN", "run"],
     ["Run", "run", "RUN", "run"]),
    # len<3 dropped at index time; exactly-3 kept unstemmed
    ("ab abc abcd",
     ["ab", "abc", "abcd"],
     ["abc", "abcd"]),
    # stopwords dropped at index time (raw word match)
    ("the search of engines",
     ["the", "search", "of", "engines"],
     ["search", "engin"]),
    # punctuation splits; unicode letters are token chars
    ("héllo,wörld!x9",
     ["héllo", "wörld", "x9"],
     ["héllo", "wörld"]),
    # underscore splits (Go unicode.IsLetter excludes it)
    ("foo_bar", ["foo", "bar"], ["foo", "bar"]),
    ("", [], []),
]


def test_golden_tokens():
    for text, raw, idx in GOLDEN:
        assert raw_tokens(text) == raw, text
        assert index_tokens(text) == idx, text


def test_vector_query_narrow_charset():
    # query splitter keeps only letters+digits: ' - / split the token
    assert vector_query_terms("don't state-of-the-art tcp/ip") == [
        "don", "t", "state", "art", "tcp", "ip"]
    # "the", "of" are stopwords filtered on the raw word; the "t"
    # fragment is kept (queries have no length filter, only the
    # stemming len>3 gate)


def test_vector_query_stopword_on_raw_word():
    # stopword check happens BEFORE stemming (vector_query.go:60-62)
    assert vector_query_terms("making") == ["make"]  # 'making' not a stopword
    assert vector_query_terms("make") == []          # 'make' is


def test_duplicates_kept():
    assert vector_query_terms("search search") == ["search", "search"]


def test_bool_term_no_stopword_filter():
    assert bool_query_term("the") == "the"
    assert bool_query_term("running") == "run"
    assert bool_query_term("run") == "run"  # len 3: unstemmed


def test_index_vs_query_asymmetry():
    # "don't" is ONE index token but splits to "don"+"t" in queries —
    # the reference's deliberate asymmetry (SURVEY.md §7); queries
    # apply no length filter, so the "t" fragment survives
    assert index_tokens("don't") == ["don't"]
    assert vector_query_terms("don't") == ["don", "t"]


def test_extraction_invariant(pages_df):
    """input_hint per-row invariant: text is byte-identical to the
    extraction of html, per url (SURVEY.md §7)."""
    from rechercheinfoweb_spark.sources.web_pages import (
        extraction_mismatches,
    )
    assert extraction_mismatches(pages_df).count() == 0


def test_raw_tokens_fast_path_equals_regex():
    """raw_tokens' ASCII translate+split fast path must be
    token-identical to TOKEN_RE.findall (the T1 spec); non-ASCII
    falls back to the regex itself."""
    from hypothesis import given, settings, strategies as st

    from rechercheinfoweb_spark.functions.tokenizer import (
        TOKEN_RE, raw_tokens,
    )

    fixtures = [
        "", "   ", "\t\n", "a/b-test 'don't' x_y foo.bar,baz",
        "a//b--c''d", "don't--stop", "~!@#$%^&*()_+=[]{};:\"<>?,.",
        "état naïve …dots… 中文 mixed ascii",
        "trailing-", "-leading", "'", "/", "0x1f 3.14 1,000",
    ]
    for t in fixtures:
        assert raw_tokens(t) == TOKEN_RE.findall(t), t

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(max_codepoint=127),
                   max_size=200))
    def ascii_prop(t):
        assert raw_tokens(t) == TOKEN_RE.findall(t)

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=120))
    def unicode_prop(t):
        assert raw_tokens(t) == TOKEN_RE.findall(t)

    ascii_prop()
    unicode_prop()
