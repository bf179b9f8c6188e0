"""Logical query tree — the analogue of tantivy's Query objects.

Reference: /root/reference/src/query/ (term_query.rs, boolean_query.rs:119-132,
boost_query.rs, const_score_query.rs, disjunction_max_query.rs:64-83).
Occur semantics are Lucene's: Must intersects and scores, Should unions and
scores, MustNot excludes and never scores; the score of a matching doc is
the sum over matching scoring clauses, with `minimum_should_match`
thresholding the number of matching Should clauses
(boolean_query.rs:119-121, boolean_weight.rs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Occur(Enum):
    MUST = "must"
    SHOULD = "should"
    MUST_NOT = "must_not"


class Query:
    """Marker base class."""

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class TermQuery(Query):
    """Docs containing `term`, BM25-scored (src/query/term_query/term_query.rs:61)."""

    term: str

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class AllQuery(Query):
    """Matches all docs with score 1.0 (src/query/all_query.rs:12)."""


@dataclass(frozen=True)
class EmptyQuery(Query):
    """Matches nothing (src/query/empty_query.rs:13)."""


@dataclass(frozen=True)
class BooleanQuery(Query):
    """(Occur, subquery) clauses (src/query/boolean_query/boolean_query.rs:132).

    v1 restriction: subqueries must be TermQuery (nested booleans are
    flattened by the caller / parser where semantics allow).
    """

    clauses: tuple[tuple[Occur, Query], ...]
    minimum_should_match: int = 0  # with_minimum_required_clauses

    @staticmethod
    def new(clauses: list[tuple[Occur, Query]], minimum_should_match: int = 0) -> "BooleanQuery":
        return BooleanQuery(tuple(clauses), minimum_should_match)

    @staticmethod
    def union(terms: list[str]) -> "BooleanQuery":
        return BooleanQuery(tuple((Occur.SHOULD, TermQuery(t)) for t in terms))

    @staticmethod
    def intersection(terms: list[str]) -> "BooleanQuery":
        return BooleanQuery(tuple((Occur.MUST, TermQuery(t)) for t in terms))

    def terms(self) -> list[str]:
        out: list[str] = []
        for _, q in self.clauses:
            out.extend(q.terms())
        return out


@dataclass(frozen=True)
class BoostQuery(Query):
    """Multiplies the inner query's scores by `boost`
    (src/query/boost_query.rs:15, Bm25Weight::boost_by bm25.rs:95-106)."""

    query: Query
    boost: float

    def terms(self) -> list[str]:
        return self.query.terms()


@dataclass(frozen=True)
class ConstScoreQuery(Query):
    """Uniform score for every match (src/query/const_score_query.rs:13)."""

    query: Query
    score: float

    def terms(self) -> list[str]:
        return self.query.terms()


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(clause scores) + tie_breaker * (sum - max)
    (src/query/disjunction_max_query.rs:64-83)."""

    queries: tuple[Query, ...]
    tie_breaker: float = 0.0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.queries:
            out.extend(q.terms())
        return out


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Terms at consecutive (or <= slop-displaced) positions, scored like a
    single term with summed idf (src/query/phrase_query/phrase_query.rs:24,
    bm25.rs:136-142). Requires an index built with positions=True."""

    phrase_terms: tuple[str, ...]
    slop: int = 0

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass(frozen=True)
class FuzzyTermQuery(Query):
    """Docs containing a term within Levenshtein distance of `term`
    (src/query/fuzzy_query.rs:80-106).  `prefix=True` matches terms the
    automaton accepts as prefixes.  Matching docs score
    boost * (number of matched expanded terms in doc) — the reference
    unions ConstScorers with a SumCombiner (automaton_weight.rs:90-104)."""

    term: str
    distance: int = 1
    transposition_cost_one: bool = True
    prefix: bool = False

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class RegexQuery(Query):
    """Docs containing a term matching the regex, const-scored like Fuzzy
    (src/query/regex_query.rs:57, automaton_weight.rs)."""

    pattern: str

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class MoreLikeThisQuery(Query):
    """Extract salient terms from a reference document, then run the
    resulting disjunction (src/query/more_like_this/more_like_this.rs:70-76;
    defaults min_doc_frequency=5, min_term_frequency=2, max_query_terms=25)."""

    doc_text: str
    min_doc_frequency: int = 5
    max_doc_frequency: int | None = None
    min_term_frequency: int = 2
    max_query_terms: int = 25
    min_word_length: int = 0
    max_word_length: int | None = None
    boost_factor: float = 1.0
    #: terms never selected (more_like_this.rs:64 `stop_words`)
    stop_words: tuple[str, ...] = ()


@dataclass(frozen=True)
class PhrasePrefixQuery(Query):
    """Phrase whose last term is a prefix, expanded against the term dict
    up to `max_expansions` (src/query/phrase_prefix_query/
    phrase_prefix_query.rs:26-69; default 50 expansions).  Scored like a
    PhraseQuery whose weight sums idfs of the FIXED terms only
    (phrase_prefix_query.rs:110-116)."""

    phrase_terms: tuple[str, ...]  # last element is the prefix
    max_expansions: int = 50

    def terms(self) -> list[str]:
        return list(self.phrase_terms[:-1])


@dataclass(frozen=True)
class RegexPhraseQuery(Query):
    """Phrase where each position matches a regex, expanded per slot
    against the term dict (src/query/phrase_query/regex_phrase_query.rs).
    Scored like a phrase whose Bm25 weight is built from the raw pattern
    terms (regex_phrase_query.rs:144-149 — their df is usually 0, giving
    the max-idf constant; reference semantics kept)."""

    patterns: tuple[str, ...]
    max_expansions: int = 50

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class TermSetQuery(Query):
    """Doc matches any term in the set — constant score 1.0 like tantivy's
    (scoring-free) TermSetQuery (src/query/term_set_query/term_set_query.rs:307)."""

    set_terms: tuple[str, ...]

    def terms(self) -> list[str]:
        return list(self.set_terms)


@dataclass(frozen=True)
class RangeQuery(Query):
    """Docs whose fast-field value falls in the bound interval, constant
    score 1.0 — the fast-field range scan (src/query/range_query/
    range_query.rs:71, range_query_fastfield.rs).  Bounds are None for
    unbounded (`*`); values are typed at evaluation against the docmap
    column type."""

    field: str
    lower: object | None = None
    upper: object | None = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class ExistsQuery(Query):
    """Docs where the field has a value — src/query/exist_query.rs:36
    (columnar non-null walk), constant score 1.0."""

    field: str

    def terms(self) -> list[str]:
        return []
