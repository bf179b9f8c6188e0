"""Snippet generation parity — the reference's own unit fixtures
(src/snippet/mod.rs tests, expected strings copied verbatim) plus an
end-to-end generator test over a real index."""

import pytest

from tantivy_spark.operators.snippet import (
    Snippet, SnippetGenerator, collapse_overlapped_ranges,
    highlight_frame, search_fragments, select_best_fragment_combination,
    select_top_fragments,
)
from tantivy_spark.plans import logical as L

# src/snippet/mod.rs TEST_TEXT, verbatim
TEST_TEXT = """Rust is a systems programming language sponsored by
Mozilla which describes it as a "safe, concurrent, practical language", supporting functional and
imperative-procedural paradigms. Rust is syntactically similar to C++[according to whom?],
but its designers intend it to provide better memory safety while still maintaining
performance.

Rust is free and open-source software, released under an MIT License, or Apache License
2.0. Its designers have refined the language through the experiences of writing the Servo
web browser layout engine[14] and the Rust compiler. A large proportion of current commits
to the project are from community members.[15]

Rust won first place for "most loved programming language" in the Stack Overflow Developer
Survey in 2016, 2017, and 2018."""


def test_snippet():                                 # mod.rs test_snippet
    terms = {"rust": 1.0, "language": 0.9}
    fragments = search_fragments(TEST_TEXT, terms, 100, chain="simple")
    assert len(fragments) == 7
    assert fragments[0].score() == pytest.approx(1.9)
    assert fragments[0].stop_offset == 89
    snippet = select_best_fragment_combination(fragments, TEST_TEXT)
    assert snippet.fragment == (
        'Rust is a systems programming language sponsored by\n'
        'Mozilla which describes it as a "safe')
    assert snippet.to_html() == (
        "<b>Rust</b> is a systems programming <b>language</b> sponsored "
        "by\nMozilla which describes it as a &quot;safe")


def test_snippet_scored_fragment():
    fragments = search_fragments(
        TEST_TEXT, {"rust": 1.0, "language": 0.9}, 20, chain="simple")
    assert fragments[0].score() == pytest.approx(1.0)
    assert fragments[0].stop_offset == 17
    snippet = select_best_fragment_combination(fragments, TEST_TEXT)
    assert snippet.to_html() == "<b>Rust</b> is a systems"

    fragments = search_fragments(
        TEST_TEXT, {"rust": 0.9, "language": 1.0}, 20, chain="simple")
    assert fragments[0].score() == pytest.approx(0.9)
    assert fragments[0].stop_offset == 17
    snippet = select_best_fragment_combination(fragments, TEST_TEXT)
    assert snippet.to_html() == "programming <b>language</b>"


def test_snippet_in_second_fragment():
    fragments = search_fragments("a b c d e f g", {"c": 1.0}, 3,
                                 chain="simple")
    assert len(fragments) == 1
    assert fragments[0].score() == pytest.approx(1.0)
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (4, 7)
    snippet = select_best_fragment_combination(fragments, "a b c d e f g")
    assert snippet.fragment == "c d"
    assert snippet.to_html() == "<b>c</b> d"


def test_snippet_with_term_at_the_end_of_fragment():
    text = "a b c d e f f g"
    fragments = search_fragments(text, {"f": 1.0}, 3, chain="simple")
    assert len(fragments) == 2
    assert fragments[0].score() == pytest.approx(1.0)
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (8, 11)
    snippet = select_best_fragment_combination(fragments, text)
    assert snippet.fragment == "e f"
    assert snippet.to_html() == "e <b>f</b>"


def test_snippet_with_second_fragment_has_the_highest_score():
    text = "a b c d e f g"
    fragments = search_fragments(text, {"f": 1.0, "a": 0.9}, 7,
                                 chain="simple")
    assert len(fragments) == 2
    assert fragments[0].score() == pytest.approx(0.9)
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (0, 7)
    snippet = select_best_fragment_combination(fragments, text)
    assert snippet.fragment == "e f g"
    assert snippet.to_html() == "e <b>f</b> g"


def test_snippet_with_term_not_in_text_or_no_terms():
    for terms in ({"z": 1.0}, {}):
        fragments = search_fragments("a b c d", terms, 3, chain="simple")
        assert fragments == []
        snippet = select_best_fragment_combination(fragments, "a b c d")
        assert snippet.fragment == "" and snippet.to_html() == ""
        assert snippet.is_empty()


def test_snippet_with_limit_and_offset():
    # mod.rs test_snippet_with_limit_and_offset: skip the first match,
    # take the next two, across fragments
    terms = {"rust": 1.0, "language": 0.9}
    fragments = search_fragments(TEST_TEXT, terms, 100, chain="simple",
                                 matches_limit=2, matches_offset=1)
    assert len(fragments) == 2
    assert fragments[0].score() == pytest.approx(0.9)
    assert fragments[0].stop_offset == 89
    assert fragments[1].score() == pytest.approx(0.9)
    assert fragments[1].stop_offset == 190
    snippet = select_best_fragment_combination(fragments, TEST_TEXT)
    assert snippet.to_html() == (
        "Rust is a systems programming <b>language</b> sponsored by\n"
        "Mozilla which describes it as a &quot;safe")


def test_custom_highlighted_elements():
    terms = {"rust": 1.0, "language": 0.9}
    fragments = search_fragments(TEST_TEXT, terms, 100, chain="simple")
    snippet = select_best_fragment_combination(fragments, TEST_TEXT)
    snippet.set_snippet_prefix_postfix('<q class="super">', "</q>")
    assert snippet.to_html() == (
        '<q class="super">Rust</q> is a systems programming '
        '<q class="super">language</q> sponsored by\nMozilla which '
        'describes it as a &quot;safe')


def test_collapse_overlapped_ranges():
    cases = [
        ([(0, 1), (2, 3)], [(0, 1), (2, 3)]),
        ([(0, 1), (1, 2)], [(0, 1), (1, 2)]),      # adjacent NOT merged
        ([(0, 2), (1, 2)], [(0, 2)]),
        ([(0, 2), (1, 3)], [(0, 3)]),
        ([(0, 3), (1, 2)], [(0, 3)]),
        ([(0, 1), (1, 2), (2, 3)], [(0, 1), (1, 2), (2, 3)]),
        ([(0, 2), (1, 3), (2, 4)], [(0, 4)]),
        ([(0, 5), (1, 2), (3, 4)], [(0, 5)]),
        ([(0, 2), (2, 4), (0, 2), (2, 4)], [(0, 2), (2, 4)]),
        ([(2, 4), (0, 2), (1, 3)], [(0, 4)]),
        ([(0, 2), (5, 7), (1, 3), (8, 9), (2, 4), (3, 6), (8, 10)],
         [(0, 7), (8, 10)]),
        ([], []),
    ]
    for ranges, expected in cases:
        assert collapse_overlapped_ranges(ranges) == expected


def test_overlapped_highlighted_ranges_render():
    # mod.rs test_snippet_with_overlapped_highlighted_ranges ("ab"+"bc"
    # ngram matches over "abc" render as one <b>abc</b>)
    s = Snippet("abc", [(0, 2), (1, 3)])
    assert s.to_html() == "<b>abc</b>"


def test_select_top_fragments_orders_and_pages():
    text = "a b c d e f g"
    terms = {"f": 1.0, "a": 0.9}
    fragments = search_fragments(text, terms, 7, chain="simple")
    by_score = select_top_fragments(fragments, text, snippets_limit=2)
    assert [s.fragment for s in by_score] == ["e f g", "a b c d"]
    by_pos = select_top_fragments(fragments, text, snippets_limit=0,
                                  sort_order="position")
    assert [s.fragment for s in by_pos] == ["a b c d", "e f g"]
    paged = select_top_fragments(fragments, text, snippets_limit=1,
                                 snippets_offset=1)
    assert [s.fragment for s in paged] == ["a b c d"]


def test_unicode_byte_offsets():
    # multi-byte text: offsets are bytes, fragments decode cleanly
    text = "héllo wörld héllo"
    fragments = search_fragments(text, {"wörld": 1.0}, 12)
    snippet = select_best_fragment_combination(fragments, text)
    assert "wörld" in snippet.fragment
    assert snippet.to_html().count("<b>wörld</b>") == 1


def test_snippet_generator_end_to_end(spark, tmp_path):
    """SnippetGenerator.create over a real searcher: 1/(1+df) weights,
    zero-df terms dropped, doc_freq from the built index, and the
    reference's en_stem doc-example behavior (designers highlighted for
    the query term "design")."""
    from tantivy_spark.config import IndexConfig
    from tantivy_spark.operators.build import build_index
    from tantivy_spark.operators.search import Searcher

    rows = [("d1", TEST_TEXT), ("d2", "rust rust rust"),
            ("d3", "unrelated words entirely")]
    src = spark.createDataFrame(rows, "k string, text string")
    idx = str(tmp_path / "snip_idx")
    cfg = IndexConfig(text_col="text", key_cols=("k",),
                      segment_col="k", n_segments=2,
                      n_term_buckets=4, tokenizer="en_stem",
                      positions=False)
    build_index(spark, src, idx, cfg)
    searcher = Searcher(spark, idx)

    gen = searcher.snippet_generator(
        L.BooleanQuery.union(["rust", "design", "zzzznotaterm"]))
    assert gen.chain == "en_stem"
    assert "zzzznotaterm" not in gen.terms_text
    assert gen.terms_text["rust"] == pytest.approx(1.0 / (1.0 + 2))
    assert gen.terms_text["design"] == pytest.approx(1.0 / (1.0 + 1))
    # the reference test_snippet_generator expectation (mod.rs:1084-1100)
    snippet = gen.snippet(TEST_TEXT)
    assert snippet.to_html() == (
        "imperative-procedural paradigms. <b>Rust</b> is syntactically "
        "similar to C++[according to whom?],\nbut its <b>designers</b> "
        "intend it to provide better memory safety")
    gen.set_max_num_chars(90)
    snippet = gen.snippet(TEST_TEXT)
    assert snippet.to_html() == (
        "<b>Rust</b> is syntactically similar to C++[according to "
        "whom?],\nbut its <b>designers</b> intend it to")
    # a term absent from the index yields empty snippets, not errors
    gen2 = searcher.snippet_generator(L.TermQuery("zzzznotaterm"))
    assert gen2.snippet("no match here").is_empty()


def test_highlight_frame(spark):
    rows = [("a", "rust is fast"), ("b", "python is friendly"),
            ("c", None)]
    df = spark.createDataFrame(rows, "key string, body string")
    out = highlight_frame(df, "body", {"rust": 1.0, "python": 0.5},
                          max_num_chars=50)
    got = {r["key"]: r["snippet_html"] for r in out.collect()}
    assert got["a"] == "<b>rust</b> is fast"
    assert got["b"] == "<b>python</b> is friendly"
    assert got["c"] == ""
