"""Query-string parser tests (grammar per query_parser.rs:131-205)."""

import pytest

from tantivy_spark.plans import logical as L
from tantivy_spark.plans.parser import QueryParser, QueryParserError


P = QueryParser()


def test_single_term():
    assert P.parse("Hello") == L.TermQuery("hello")


def test_default_or():
    q = P.parse("foo bar")
    assert q == L.BooleanQuery.new(
        [(L.Occur.SHOULD, L.TermQuery("foo")), (L.Occur.SHOULD, L.TermQuery("bar"))]
    )


def test_default_and_mode():
    q = QueryParser(default_conjunction=True).parse("foo bar")
    assert q == L.BooleanQuery.new(
        [(L.Occur.MUST, L.TermQuery("foo")), (L.Occur.MUST, L.TermQuery("bar"))]
    )


def test_plus_minus():
    q = P.parse("+req -banned opt")
    assert q == L.BooleanQuery.new([
        (L.Occur.MUST, L.TermQuery("req")),
        (L.Occur.MUST_NOT, L.TermQuery("banned")),
        (L.Occur.SHOULD, L.TermQuery("opt")),
    ])


def test_and_binds_tighter_than_or():
    q = P.parse("a AND b OR c")
    assert isinstance(q, L.BooleanQuery)
    occurs = [o for o, _ in q.clauses]
    assert occurs == [L.Occur.SHOULD, L.Occur.SHOULD]
    left = q.clauses[0][1]
    assert left == L.BooleanQuery.new(
        [(L.Occur.MUST, L.TermQuery("a")), (L.Occur.MUST, L.TermQuery("b"))]
    )
    assert q.clauses[1][1] == L.TermQuery("c")


def test_phrase_and_slop():
    assert P.parse('"quick brown"') == L.PhraseQuery(("quick", "brown"))
    assert P.parse('"quick brown"~2') == L.PhraseQuery(("quick", "brown"), slop=2)
    # single-token phrase degrades to a term
    assert P.parse('"quick"') == L.TermQuery("quick")


def test_boost():
    assert P.parse("foo^2") == L.BoostQuery(L.TermQuery("foo"), 2.0)
    q = P.parse("(a b)^0.5")
    assert isinstance(q, L.BoostQuery) and q.boost == 0.5


def test_field_prefix():
    assert P.parse("text:foo") == L.TermQuery("foo")
    with pytest.raises(QueryParserError):
        P.parse("body:foo")


def test_all_and_empty():
    assert P.parse("*") == L.AllQuery()
    assert P.parse("") == L.EmptyQuery()
    assert P.parse("   ") == L.EmptyQuery()


def test_parens_grouping():
    q = P.parse("+(a OR b) -c")
    assert isinstance(q, L.BooleanQuery)
    (o1, q1), (o2, q2) = q.clauses
    assert o1 == L.Occur.MUST and isinstance(q1, L.BooleanQuery)
    assert o2 == L.Occur.MUST_NOT and q2 == L.TermQuery("c")


def test_multi_token_literal_becomes_phrase():
    # punctuation splits into two analyzer tokens -> phrase (positions on)
    assert P.parse("foo-bar") == L.PhraseQuery(("foo", "bar"))
    # without positions: degrade to OR + warning (tantivy raises instead)
    p2 = QueryParser(positions=False)
    q = p2.parse("foo-bar")
    assert q == L.BooleanQuery.union(["foo", "bar"])
    assert p2.warnings


def test_unbalanced_paren():
    with pytest.raises(QueryParserError):
        P.parse("(a b")


def test_long_token_dropped_by_analyzer():
    q = P.parse("x" * 45)
    assert q == L.EmptyQuery() or isinstance(q, L.EmptyQuery)


def test_not_operator():
    # query_grammar.rs tests: "NOT a" -> (-a); "a AND NOT b" -> must a,
    # must_not b (pure negation folds into the enclosing boolean)
    q = P.parse("NOT a")
    assert q == L.BooleanQuery.new([(L.Occur.MUST_NOT, L.TermQuery("a"))])
    q = P.parse("a AND NOT b")
    assert q == L.BooleanQuery.new([
        (L.Occur.MUST, L.TermQuery("a")),
        (L.Occur.MUST_NOT, L.TermQuery("b")),
    ])
    q = P.parse("a OR NOT b")
    assert q == L.BooleanQuery.new([
        (L.Occur.SHOULD, L.TermQuery("a")),
        (L.Occur.MUST_NOT, L.TermQuery("b")),
    ])
    # NOTa is a term, not the keyword (query_grammar.rs:1295)
    assert P.parse("NOTa") == L.TermQuery("nota")


def test_range_syntax():
    q = P.parse("n_chars:[250 TO 320}")
    assert q == L.RangeQuery("n_chars", lower="250", upper="320",
                             lower_inclusive=True, upper_inclusive=False)
    q = P.parse("role:{a TO c]")
    assert q == L.RangeQuery("role", lower="a", upper="c",
                             lower_inclusive=False, upper_inclusive=True)
    q = P.parse("ts:[* TO 10]")
    assert q == L.RangeQuery("ts", lower=None, upper="10",
                             lower_inclusive=True, upper_inclusive=True)
    q = P.parse("n_chars:>=5")
    assert q == L.RangeQuery("n_chars", lower="5", upper=None,
                             lower_inclusive=True, upper_inclusive=False)
    q = P.parse("n_chars:<10")
    assert q == L.RangeQuery("n_chars", lower=None, upper="10",
                             lower_inclusive=False, upper_inclusive=False)
    # composes in booleans
    q = P.parse("wizard AND n_chars:>3")
    assert isinstance(q, L.BooleanQuery)


def test_in_set_syntax():
    q = P.parse("text: IN [Alpha beta]")
    assert q == L.TermSetQuery(("alpha", "beta"))
    with pytest.raises(QueryParserError):
        P.parse("other: IN [a]")


def test_exists_syntax():
    assert P.parse("role:*") == L.ExistsQuery("role")
    # bare * is still AllQuery
    assert P.parse("*") == L.AllQuery()


def test_parser_fuzz_never_crashes():
    """Random query-ish strings: the parser returns a Query or raises
    QueryParserError — never any other exception (the reference's lenient
    parser contract, query_parser.rs parse_query_lenient)."""
    import numpy as np

    rng = np.random.default_rng(31)
    alphabet = list('ab c"()[]{}:^~*+-OR AND NOT IN TO 0159.\\é東')
    for _ in range(400):
        n = int(rng.integers(0, 30))
        s = "".join(rng.choice(alphabet, size=n))
        try:
            q = P.parse(s)
        except QueryParserError:
            continue
        assert isinstance(q, L.Query), s


# -- per-field config (query_parser.rs:294-318) ---------------------------

def test_field_boost_multiplies_literals():
    p = QueryParser()
    p.set_field_boost("text", 2.0)
    assert p.parse("abc") == L.BoostQuery(L.TermQuery("abc"), 2.0)
    # query-language boost multiplies (wraps) the field boost
    assert p.parse("abc^3") == L.BoostQuery(
        L.BoostQuery(L.TermQuery("abc"), 2.0), 3.0)
    assert p.parse('"hello world"') == L.BoostQuery(
        L.PhraseQuery(("hello", "world")), 2.0)


def test_field_boost_scoped_field():
    p = QueryParser(extra_fields=("lang",))
    p.set_field_boost("lang", 4.0)
    q = p.parse("lang:en abc")
    assert q == L.BooleanQuery.new([
        (L.Occur.SHOULD, L.BoostQuery(L.TermQuery("lang:en"), 4.0)),
        (L.Occur.SHOULD, L.TermQuery("abc")),
    ])


def test_field_fuzzy_single_term_literals():
    # reference test_set_field_fuzzy (query_parser.rs:1999-2037)
    p = QueryParser()
    p.set_field_fuzzy("text", False, 1, True)
    assert p.parse("abc") == L.FuzzyTermQuery(
        "abc", distance=1, transposition_cost_one=True, prefix=False)
    # a one-token quoted phrase is a Term literal -> fuzzy applies
    assert p.parse('"abc"') == L.FuzzyTermQuery(
        "abc", distance=1, transposition_cost_one=True, prefix=False)
    # multi-token phrases never fuzz (convert_literal_to_query:922-938)
    assert p.parse('"hello world"') == L.PhraseQuery(("hello", "world"))


def test_field_fuzzy_prefix_params():
    p = QueryParser()
    p.set_field_fuzzy("text", True, 2, False)
    assert p.parse("abc") == L.FuzzyTermQuery(
        "abc", distance=2, transposition_cost_one=False, prefix=True)


def test_field_fuzzy_only_configured_field():
    p = QueryParser(extra_fields=("lang",))
    p.set_field_fuzzy("lang", False, 1, True)
    assert p.parse("abc") == L.TermQuery("abc")
    assert p.parse("lang:en") == L.FuzzyTermQuery(
        "lang:en", distance=1, transposition_cost_one=True, prefix=False)


# -- json dynamic-field paths (query_parser.rs:516-560) -------------------

def test_json_path_literal():
    p = QueryParser(field="props", tokenizer="json", json_fields=("props",))
    assert p.parse("props.k:69") == L.TermQuery("k:69")
    assert p.parse("props.a.b:Hello") == L.TermQuery("a.b:hello")


def test_json_path_phrase():
    p = QueryParser(field="props", tokenizer="json", json_fields=("props",))
    assert p.parse('props.a.b:"Hello World"') == L.PhraseQuery(
        ("a.b:hello", "a.b:world"))


def test_json_path_with_rfc3339_range():
    p = QueryParser(field="props", tokenizer="json", json_fields=("props",))
    q = p.parse(
        "props.k:69 AND ts:[2024-01-05T00:00:00Z TO 2024-01-20T00:00:00Z}")
    assert q == L.BooleanQuery.new([
        (L.Occur.MUST, L.TermQuery("k:69")),
        (L.Occur.MUST, L.RangeQuery(
            "ts", lower="2024-01-05T00:00:00Z",
            upper="2024-01-20T00:00:00Z",
            lower_inclusive=True, upper_inclusive=False)),
    ])


def test_regex_literal_gated():
    # query_parser.rs:873-879: regexes error unless allow_regexes()
    p = QueryParser()
    with pytest.raises(QueryParserError):
        p.parse("text:/joh?n/")
    p.allow_regexes()
    assert p.parse("text:/joh?n(ath[oa]n)/") == L.RegexQuery("joh?n(ath[oa]n)")
    # escaped slash (query_grammar.rs test_regex_parser)
    assert p.parse(r"text:/\/cgi-bin\/luci.*/") == L.RegexQuery("/cgi-bin/luci.*")
    # boost applies (foo:/bar/^2)
    assert p.parse("text:/bar/^2") == L.BoostQuery(L.RegexQuery("bar"), 2.0)
    # composes in booleans
    q = p.parse("table AND text:/val.*/")
    assert q == L.BooleanQuery.new([
        (L.Occur.MUST, L.TermQuery("table")),
        (L.Occur.MUST, L.RegexQuery("val.*")),
    ])
    with pytest.raises(QueryParserError):
        p.parse("zzz:/bar/")
