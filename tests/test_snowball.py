"""Snowball stemmer + stop-word parity tests.

Vectors in tests/snowball_vectors.py were generated against the official
Snowball implementations (PostgreSQL's snowball dictionaries compile the
snowballstem.org sources — the same algorithms rust-stemmers generates
from, which is what the reference's Stemmer filter calls,
src/tokenizer/stemmer.rs:40-70).  ~280 vectors per language: real
vocabulary (stop lists, sample corpora, curated inflections covering
every suffix class) plus structured fuzz words that stress region
boundaries.
"""

import pytest

from tantivy_spark.functions import snowball as S
from tantivy_spark.functions.analysis import (
    build_analyzer, get_stemmer, get_stopwords,
)
from tests.snowball_vectors import VECTORS

LANGS = sorted(VECTORS)


@pytest.mark.parametrize("lang", LANGS)
def test_vectors(lang):
    fn = getattr(S, f"stem_{lang}")
    bad = [(w, e, fn(w)) for w, e in VECTORS[lang] if fn(w) != e]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


@pytest.mark.parametrize("lang", LANGS)
def test_idempotent_on_empty_and_short(lang):
    fn = getattr(S, f"stem_{lang}")
    assert fn("") == ""
    for w in ("a", "b", "é", "яя"):
        out = fn(w)
        assert isinstance(out, str)


def test_get_stemmer_dispatch():
    assert get_stemmer("de")("möglichkeiten") == "moglich"
    assert get_stemmer("german") is get_stemmer("de")
    assert get_stemmer("en")("running") == "run"
    assert get_stemmer("fr")("continuellement") == "continuel"
    assert get_stemmer("ta")("மரங்கள்") == "மரங்"
    with pytest.raises(KeyError):
        get_stemmer("czech")  # reference-supported, not shipped


def test_get_stopwords():
    assert "der" in get_stopwords("de")
    assert "и" in get_stopwords("ru")
    assert "the" in get_stopwords("en")
    assert "voor" in get_stopwords("nl")
    with pytest.raises(KeyError):
        get_stopwords("xx")


def test_build_analyzer_language_chain():
    # a German analysis chain: lowercase -> german stopwords -> stemmer
    de = build_analyzer(
        "simple",
        filters=[("lowercase",), ("stopword", "de"), ("stemmer", "de")],
    )
    terms, positions = de("Die Möglichkeiten der Entwicklungen")
    # "die"/"der" are stopwords; the rest stems
    assert terms == ["moglich", "entwickl"]
    # positions keep their pre-filter slots (stopword removal leaves gaps)
    assert positions == [1, 3]


def test_build_analyzer_russian_chain():
    ru = build_analyzer(
        "simple", filters=[("lowercase",), ("stemmer", "ru")])
    terms, _ = ru("Пользователями программирование")
    assert terms == ["пользовател", "программирован"]


def test_stopword_iterable_still_works():
    an = build_analyzer(
        "simple", filters=[("lowercase",), ("stopword", ["foo"])])
    assert an("Foo bar")[0] == ["bar"]
