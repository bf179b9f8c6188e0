"""SnippetGenerator — highlighted document previews.

Re-expresses the reference's snippet module (src/snippet/mod.rs):
fragments are built by streaming the field's token stream and breaking
whenever a token would extend the current fragment past `max_num_chars`
bytes (mod.rs:271-290 `search_fragments`); a fragment's score is the sum
of its matched-term scores, each term scoring 1/(1+doc_freq)
(mod.rs:616-627 `SnippetGenerator::create`); the best fragment (ties ->
earliest, mod.rs:343-356) or the top-k by score/position
(`select_top_fragments`) are rendered to HTML with overlap-collapsed
highlight ranges (mod.rs:505-507 `collapse_overlapped_ranges`).

All offsets are BYTE offsets into the UTF-8 text, like the reference's
`Token::offset_{from,to}` — fragment boundaries land on token edges so
byte slices always decode.

Snippet generation is a per-displayed-hit operation (top-k rows), so
`SnippetGenerator` works driver-side on fetched rows; `highlight_frame`
wraps the same kernel in mapInPandas for bulk/offline highlighting at
corpus scale.
"""

from __future__ import annotations

import html
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from tantivy_spark.functions.analysis import (
    DEFAULT_LONG_LIMIT, _lower_no_final_sigma, _TOKEN_RE,
)
from tantivy_spark.plans import logical as L

DEFAULT_MAX_NUM_CHARS = 150
DEFAULT_SNIPPET_PREFIX = "<b>"
DEFAULT_SNIPPET_POSTFIX = "</b>"


# ---------------------------------------------------------------------------
# offset-preserving token streams (the analyzers in functions/analysis.py
# return bare term lists; snippets need original-text byte offsets)
# ---------------------------------------------------------------------------

def _byte_offsets(text: str) -> list[int]:
    """Prefix byte offsets: off[i] = byte offset of codepoint i."""
    off = [0] * (len(text) + 1)
    acc = 0
    for i, ch in enumerate(text):
        acc += len(ch.encode("utf-8"))
        off[i + 1] = acc
    return off


def token_stream(text: str, chain: str = "default"
                 ) -> Iterator[tuple[str, int, int]]:
    """Yield (token_text_after_chain, byte_from, byte_to) for the named
    analyzer chain.  Offsets index the ORIGINAL text (filters transform
    the token text only, like the reference's Token struct)."""
    off = _byte_offsets(text)
    if chain in ("default", "simple", "en_stem"):
        stem = None
        if chain == "en_stem":
            from tantivy_spark.functions.porter2 import stem
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if chain != "simple" and \
                    len(tok.encode("utf-8")) >= DEFAULT_LONG_LIMIT:
                continue    # RemoveLongFilter drops it from the stream
            if chain != "simple":
                tok = _lower_no_final_sigma(tok)
            if stem is not None:
                tok = stem(tok)
            yield tok, off[m.start()], off[m.end()]
    elif chain == "whitespace":
        import re
        for m in re.finditer(r"\S+", text):
            yield m.group(), off[m.start()], off[m.end()]
    else:
        raise ValueError(f"snippet: unsupported analyzer chain {chain!r}")


# ---------------------------------------------------------------------------
# fragments
# ---------------------------------------------------------------------------

class FragmentCandidate:
    """mod.rs:127-174 — a token-aligned window with its matched terms."""

    __slots__ = ("start_offset", "stop_offset", "highlighted")

    def __init__(self, start_offset: int):
        self.start_offset = start_offset
        self.stop_offset = start_offset
        self.highlighted: list[tuple[int, int, float]] = []

    def try_add_token(self, tok: str, b_from: int, b_to: int,
                      terms: dict[str, float]):
        self.stop_offset = b_to
        score = terms.get(tok.lower())
        if score is not None:
            self.highlighted.append((b_from, b_to, score))

    def score(self) -> float:
        return sum(s for _, _, s in self.highlighted)


def search_fragments(text: str, terms: dict[str, float],
                     max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
                     chain: str = "default",
                     matches_limit: int | None = None,
                     matches_offset: int | None = None,
                     tokens: Iterable[tuple[str, int, int]] | None = None,
                     ) -> list[FragmentCandidate]:
    """mod.rs `search_fragments`: break fragments at token boundaries so
    no fragment exceeds max_num_chars bytes; keep only scoring ones."""
    fragment = FragmentCandidate(0)
    fragments: list[FragmentCandidate] = []
    for tok, b_from, b_to in (tokens if tokens is not None
                              else token_stream(text, chain)):
        if b_to - fragment.start_offset > max_num_chars:
            if fragment.score() > 0.0:
                fragments.append(fragment)
            fragment = FragmentCandidate(b_from)
        fragment.try_add_token(tok, b_from, b_to, terms)
    if fragment.score() > 0.0:
        fragments.append(fragment)

    if matches_limit is None and matches_offset is None:
        return fragments
    # skip/take across all highlighted matches, dropping emptied
    # fragments (mod.rs:296-339)
    remaining_offset = matches_offset or 0
    remaining_limit = (matches_limit if matches_limit is not None
                       else sum(len(f.highlighted) for f in fragments))
    filtered: list[FragmentCandidate] = []
    for fragment in fragments:
        if remaining_limit == 0:
            break
        n = len(fragment.highlighted)
        if remaining_offset >= n:
            remaining_offset -= n
            continue
        take = min(n - remaining_offset, remaining_limit)
        fragment.highlighted = fragment.highlighted[
            remaining_offset:remaining_offset + take]
        remaining_offset = 0
        remaining_limit -= take
        if fragment.highlighted:
            filtered.append(fragment)
    return filtered


def collapse_overlapped_ranges(
        ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort, dedup, then merge truly-overlapping (NOT merely adjacent)
    ranges — mod.rs:454-507."""
    out: list[list[int]] = []
    for start, end in sorted(set(ranges)):
        if out and out[-1][1] > start:
            out[-1][1] = max(out[-1][1], end)
        else:
            out.append([start, end])
    return [(s, e) for s, e in out]


class Snippet:
    """A text fragment plus highlight byte ranges (mod.rs:177-245)."""

    def __init__(self, fragment: str = "",
                 highlighted: list[tuple[int, int]] | None = None):
        self.fragment = fragment
        self.highlighted = highlighted or []
        self.snippet_prefix = DEFAULT_SNIPPET_PREFIX if highlighted else ""
        self.snippet_postfix = DEFAULT_SNIPPET_POSTFIX if highlighted else ""

    def is_empty(self) -> bool:
        return not self.highlighted

    def set_snippet_prefix_postfix(self, prefix: str, postfix: str):
        self.snippet_prefix = prefix
        self.snippet_postfix = postfix

    def to_html(self) -> str:
        """Highlight with prefix/postfix, HTML-escaping the fragment
        (htmlescape::encode_minimal = &, <, >, quotes)."""
        frag = self.fragment.encode("utf-8")
        parts: list[str] = []
        start_from = 0
        for s, e in collapse_overlapped_ranges(self.highlighted):
            parts.append(html.escape(frag[start_from:s].decode("utf-8")))
            parts.append(self.snippet_prefix)
            parts.append(html.escape(frag[s:e].decode("utf-8")))
            parts.append(self.snippet_postfix)
            start_from = e
        parts.append(html.escape(frag[start_from:].decode("utf-8")))
        return "".join(parts)


def _to_snippet(fragment: FragmentCandidate, text_bytes: bytes) -> Snippet:
    frag = text_bytes[fragment.start_offset:fragment.stop_offset]
    highlighted = [(s - fragment.start_offset, e - fragment.start_offset)
                   for s, e, _ in fragment.highlighted]
    return Snippet(frag.decode("utf-8"), highlighted)


def select_best_fragment_combination(fragments: list[FragmentCandidate],
                                     text: str) -> Snippet:
    """Highest score wins; ties go to the earliest fragment
    (mod.rs:343-370)."""
    best = None
    for f in fragments:
        if best is None:
            best = f
            continue
        fs, bs = f.score(), best.score()
        if fs > bs or (fs == bs and (f.start_offset, f.stop_offset)
                       < (best.start_offset, best.stop_offset)):
            best = f
    if best is None:
        return Snippet()
    return _to_snippet(best, text.encode("utf-8"))


def select_top_fragments(fragments: list[FragmentCandidate], text: str,
                         snippets_limit: int = 1, snippets_offset: int = 0,
                         sort_order: str = "score") -> list[Snippet]:
    """mod.rs `select_top_fragments`: sort by score desc (start asc ties)
    or by position, then paginate.  limit 0 = all."""
    if not fragments:
        return []
    if sort_order == "score":
        ordered = sorted(fragments,
                         key=lambda f: (-f.score(), f.start_offset))
    elif sort_order == "position":
        ordered = sorted(fragments, key=lambda f: f.start_offset)
    else:
        raise ValueError(f"unknown snippet sort order {sort_order!r}")
    if snippets_limit:
        ordered = ordered[:snippets_limit + snippets_offset]
    ordered = ordered[snippets_offset:]
    tb = text.encode("utf-8")
    return [_to_snippet(f, tb) for f in ordered]


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def _query_terms(query) -> set[str]:
    """The query's text terms (the reference's `Query::query_terms`
    visitor: every node reports its terms; expansion queries contribute
    their per-index matched terms via the searcher in `create`)."""
    return set(query.terms())


class SnippetGenerator:
    """Reference `SnippetGenerator` (mod.rs:544-760): term scores from
    the searcher's doc freqs, fragments from the field's analyzer."""

    def __init__(self, terms_text: dict[str, float],
                 chain: str = "default",
                 max_num_chars: int = DEFAULT_MAX_NUM_CHARS):
        self.terms_text = terms_text
        self.chain = chain
        self.max_num_chars = max_num_chars
        self.matches_limit: int | None = None
        self.matches_offset: int | None = None
        self.snippets_limit = 1
        self.snippets_offset = 0
        self.sort_order = "score"

    # --- reference setters -------------------------------------------------
    def set_max_num_chars(self, n: int):
        self.max_num_chars = n

    def set_matches_limit(self, n: int):
        self.matches_limit = n

    def set_matches_offset(self, n: int):
        self.matches_offset = n

    def set_snippets_limit(self, n: int):
        self.snippets_limit = n

    def set_snippets_offset(self, n: int):
        self.snippets_offset = n

    def set_sort_order(self, order: str):
        self.sort_order = order

    @classmethod
    def create(cls, searcher, query, chain: str | None = None
               ) -> "SnippetGenerator":
        """Term score = 1/(1+doc_freq) over the searcher's index
        (mod.rs:616-627); terms with zero doc freq are dropped.  Fuzzy /
        regex queries contribute their expanded index terms."""
        terms = _query_terms(query)
        for node in _walk(query):
            if isinstance(node, L.FuzzyTermQuery):
                terms.update(searcher.expand_fuzzy(
                    node.term, node.distance,
                    transposition_cost_one=node.transposition_cost_one,
                    prefix=node.prefix))
            elif isinstance(node, L.RegexQuery):
                terms.update(searcher.expand_regex(node.pattern))
        terms = {t for t in terms if t}
        dfs = searcher.doc_freqs(sorted(terms)) if terms else {}
        terms_text = {t: 1.0 / (1.0 + float(df))
                      for t, df in dfs.items() if df > 0}
        if chain is None:
            tok = getattr(getattr(searcher, "cfg", None), "tokenizer",
                          "default")
            chain = tok if tok in ("default", "simple", "en_stem",
                                   "whitespace") else "default"
        return cls(terms_text, chain=chain)

    # --- generation ---------------------------------------------------------
    def _fragments(self, text: str) -> list[FragmentCandidate]:
        return search_fragments(
            text, self.terms_text, self.max_num_chars, self.chain,
            self.matches_limit, self.matches_offset)

    def snippet(self, text: str) -> Snippet:
        return select_best_fragment_combination(self._fragments(text), text)

    def snippets(self, text: str) -> list[Snippet]:
        return select_top_fragments(
            self._fragments(text), text, self.snippets_limit,
            self.snippets_offset, self.sort_order)

    def snippet_from_doc(self, row, text_col: str) -> Snippet:
        """Row/dict convenience mirroring `snippet_from_doc`."""
        text = row[text_col] if not hasattr(row, text_col) \
            else getattr(row, text_col)
        return self.snippet((text or "").strip())


def _walk(query):
    yield query
    if isinstance(query, L.BooleanQuery):
        for _, sub in query.clauses:
            yield from _walk(sub)
    elif isinstance(query, (L.BoostQuery, L.ConstScoreQuery)):
        yield from _walk(query.query)
    elif isinstance(query, L.DisjunctionMaxQuery):
        for sub in query.queries:
            yield from _walk(sub)


def highlight_frame(df: DataFrame, text_col: str,
                    terms_text: dict[str, float],
                    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
                    chain: str = "default",
                    out_col: str = "snippet_html") -> DataFrame:
    """Bulk highlighting: append the best-fragment HTML snippet per row.

    The term-score map is tiny (query terms only) and rides the task
    closure; the text column streams through mapInPandas one Arrow batch
    at a time — no shuffle, scales with the scan."""
    import pandas as pd

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        gen = SnippetGenerator(terms_text, chain=chain,
                               max_num_chars=max_num_chars)
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [
                gen.snippet(t or "").to_html() for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=f"{fields}, {out_col} string")
