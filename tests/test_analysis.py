"""Tokenizer parity vectors (reference: src/tokenizer/simple_tokenizer.rs,
remove_long.rs, lower_caser.rs, ARCHITECTURE.md:198-205)."""

import pandas as pd

from tantivy_spark.functions.analysis import (
    analyze_series,
    token_count_series,
    tokenize_default,
    tokenize_raw,
    tokenize_whitespace,
)


def test_basic_vector():
    terms, pos = tokenize_default("Hello, happy tax payer!")
    assert terms == ["hello", "happy", "tax", "payer"]
    assert pos == [0, 1, 2, 3]


def test_punctuation_compound_splits():
    terms, pos = tokenize_default("foo-bar")
    assert terms == ["foo", "bar"]
    assert pos == [0, 1]


def test_long_token_dropped_by_bytes_with_position_gap():
    # 39 bytes kept, 40 bytes dropped (remove_long.rs: keep iff len < 40)
    t39 = "a" * 39
    t40 = "b" * 40
    terms, pos = tokenize_default(f"start {t39} {t40} end")
    assert terms == ["start", t39, "end"]
    assert pos == [0, 1, 3]  # dropped token leaves a position gap


def test_long_limit_counts_utf8_bytes_not_chars():
    # 14 chars x 3 bytes = 42 bytes >= 40 -> dropped
    tok = "東" * 14
    terms, _ = tokenize_default(f"x {tok} y")
    assert terms == ["x", "y"]
    # 13 chars x 3 = 39 bytes -> kept
    tok13 = "東" * 13
    terms, _ = tokenize_default(f"x {tok13} y")
    assert terms == ["x", tok13, "y"]


def test_unicode_lowercase_no_final_sigma():
    # Rust LowerCaser skips the Greek final-sigma context rule
    terms, _ = tokenize_default("ΣΊΣΥΦΟΣ")
    assert terms == ["σίσυφοσ"]  # NOT σίσυφος
    terms, _ = tokenize_default("Grüße HÉLLO")
    assert terms == ["grüße", "héllo"]


def test_numbers_and_mixed():
    terms, _ = tokenize_default("AB12 34cd, 5.6")
    assert terms == ["ab12", "34cd", "5", "6"]


def test_cjk_tokens():
    terms, _ = tokenize_default("東京 rocks")
    assert terms == ["東京", "rocks"]


def test_empty_and_punct_only():
    assert tokenize_default("") == ([], [])
    assert tokenize_default("!!! --- ???") == ([], [])


def test_raw_tokenizer():
    assert tokenize_raw("Hello, World!") == (["Hello, World!"], [0])
    assert tokenize_raw("") == ([], [])


def test_whitespace_tokenizer_no_filters():
    # bare WhitespaceTokenizer: no lowercase, no length filter
    long_tok = "X" * 50
    terms, pos = tokenize_whitespace(f"Hello, {long_tok}")
    assert terms == ["Hello,", long_tok]
    assert pos == [0, 1]


def test_series_api():
    s = pd.Series(["Hello, tax!", None, ""])
    out = analyze_series(s)
    assert out.iloc[0] == ["hello", "tax"]
    assert out.iloc[1] == []
    assert out.iloc[2] == []
    counts = token_count_series(s)
    assert counts.tolist() == [2, 0, 0]


# ---------------------------------------------------------------------------
# composable analyzer builder (tokenizer.rs TextAnalyzer chain)
# ---------------------------------------------------------------------------

def test_ngram_tokenizer():
    from tantivy_spark.functions.analysis import tokenize_ngram

    terms, pos = tokenize_ngram("abcd", 2, 3)
    assert terms == ["ab", "abc", "bc", "bcd", "cd"]
    assert pos == [0, 0, 1, 1, 2]
    terms_p, _ = tokenize_ngram("abcd", 2, 3, prefix_only=True)
    assert terms_p == ["ab", "abc"]


def test_facet_tokenizer():
    from tantivy_spark.functions.analysis import tokenize_facet

    terms, _ = tokenize_facet("/cat/sub/leaf")
    assert terms == ["/cat", "/cat/sub", "/cat/sub/leaf"]


def test_builder_stopword_stem_chain():
    from tantivy_spark.functions.analysis import build_analyzer, register_analyzer, get_analyzer

    an = build_analyzer(
        "simple",
        filters=[("remove_long", 40), ("lowercase",), ("stopword", "en"),
                 ("stemmer",)],
    )
    terms, pos = an("The Quick foxes are JUMPING!")
    # 'the'/'are' dropped by the Lucene stopword list; positions keep gaps
    assert terms == ["quick", "fox", "jump"]
    assert pos == [1, 2, 4]
    register_analyzer("en_stem_stop", an)
    assert get_analyzer("en_stem_stop") is an


def test_builder_ascii_folding_and_alphanum():
    from tantivy_spark.functions.analysis import build_analyzer

    an = build_analyzer("whitespace", filters=[("ascii_folding",), ("lowercase",)])
    terms, _ = an("Crème Brûlée naïve")
    assert terms == ["creme", "brulee", "naive"]
    an2 = build_analyzer("whitespace", filters=[("alphanum_only",)])
    terms2, _ = an2("ok not-ok also_bad fine2")
    assert terms2 == ["ok", "fine2"]


def test_builder_regex_tokenizer():
    from tantivy_spark.functions.analysis import build_analyzer

    an = build_analyzer("regex", pattern=r"[0-9]+")
    assert an("a1 bb22 c333")[0] == ["1", "22", "333"]


def test_json_tokenizer():
    from tantivy_spark.functions.analysis import tokenize_json

    terms, pos = tokenize_json('{"k": 69, "tags": ["A b", "c"], "nested": {"x": 1.5, "ok": true}}')
    assert terms == ["k:69", "tags:a", "tags:b", "tags:c", "nested.x:1.5",
                     "nested.ok:true"]
    assert pos == list(range(6))
    assert tokenize_json("not json") == ([], [])
    assert tokenize_json('{"f": 2.0}')[0] == ["f:2"]  # integral float
    assert tokenize_json('{"n": null}')[0] == ["n:null"]


def test_ascii_folding_ligatures():
    from tantivy_spark.functions.analysis import _ascii_fold

    assert _ascii_fold("Encyclopædia") == "Encyclopaedia"
    assert _ascii_fold("Straße") == "Strasse"
    assert _ascii_fold("Œuvre") == "OEuvre"
    assert _ascii_fold("Søren") == "Soren"


def test_split_compound_words():
    from tantivy_spark.functions.analysis import build_analyzer

    an = build_analyzer(
        "simple",
        filters=[("lowercase",), ("split_compound", ["dampf", "schiff", "fahrt"])],
    )
    terms, _ = an("Dampfschifffahrt dampf unknownword")
    assert terms == ["dampf", "schiff", "fahrt", "dampf", "unknownword"]
    # partial decomposition keeps the whole token (reference semantics)
    terms2, _ = an("dampfxyz")
    assert terms2 == ["dampfxyz"]


def test_fast_terms_path_parity():
    """The findall-based terms-only fast path must be token-identical to
    the full positions path (same regex, byte limit, sigma handling)."""
    import numpy as np

    from tantivy_spark.functions.analysis import (
        _tokenize_default_terms,
        tokenize_default,
    )

    rng = np.random.default_rng(5)
    cases = [
        "The Quick brown-fox;jumps_over 123abc",
        "",
        "\u03a3\u038a\u03a3\u03a5\u03a6\u039f\u03a3 \u0391\u03a3 \u03c3 \u03c2 \u03a4\u0395\u039b\u039f\u03a3\u03a3",
        "h\u00e9llo Gr\u00fc\u00dfe \u6771\u4eac na\u00efve \u03a9\u03bc\u03ad\u03b3\u03b1",
        "x" * 39 + " " + "y" * 40 + " ok",
        "\u00e9" * 19 + " " + "\u00e9" * 20 + " mid",
        "\u6771" * 13 + " " + "\u6771" * 14,
        "-- ~~ !! __ ",
        "can't stop won't_stop",
    ]
    alphabet = list("abcXYZ 123 _-;\u03a3\u03c3\u03c2 \u00e9\u6771\u00fc\t.")
    for _ in range(30):
        cases.append("".join(rng.choice(alphabet, size=rng.integers(0, 60))))
    for text in cases:
        assert _tokenize_default_terms(text) == tokenize_default(text)[0], text


def test_ascii_folding_exact_table_semantics():
    """The fold uses the reference's explicit table only
    (ascii_folding_filter.rs fold_non_ascii_char): stroked/ligature Latin
    letters fold, non-Latin scripts pass through UNTOUCHED (an NFKD fold
    would wrongly strip Greek/Cyrillic accents)."""
    from tantivy_spark.functions.analysis import _ascii_fold

    assert _ascii_fold("Ħi") == "Hi"
    assert _ascii_fold("Øre") == "Ore"
    assert _ascii_fold("Þing") == "THing"
    assert _ascii_fold("ﬁle") == "file"
    assert _ascii_fold("ĳs") == "ijs"
    assert _ascii_fold("café") == "cafe"
    assert _ascii_fold("Grüße") == "Grusse"
    # untouched: not in the reference table
    assert _ascii_fold("Ωμέγα") == "Ωμέγα"
    assert _ascii_fold("άλφα") == "άλφα"
    assert _ascii_fold("東京") == "東京"
    assert _ascii_fold("москва́") == "москва́"
