"""Query-string parser — a subset of tantivy's query language.

Reference: /root/reference/src/query/query_parser/query_parser.rs:131-205
and the grammar crate query-grammar/src/query_grammar.rs.  Supported here:

* whitespace-separated clauses, **default OR** (the parser default;
  conjunction-by-default is opt-in, query_parser.rs:286-289)
* `+term` (Must) / `-term` (MustNot) prefixes
* `AND` / `OR` infix operators, AND binding tighter than OR
* `"quoted phrase"` -> PhraseQuery (requires positions), `"…"~N` slop
* `term^2.5` boost
* `(` grouped subqueries `)`
* `*` -> AllQuery
* `field:term` — validated against the single indexed text field
* multi-token literal (e.g. `can't` splitting into two tokens) becomes a
  PhraseQuery when positions are indexed, else the tokens are OR'd —
  tantivy errors here (`FieldDoesNotHavePositionsIndexed`); we degrade to
  the disjunction and record a warning, since a search engine returning
  results beats an exception in a data pipeline.

* `NOT x` unary negation (== `-x`; pure negations fold into the
  enclosing boolean, query_grammar.rs:790)
* `field:[a TO b]` / `{a TO b}` / `field:>=v` ranges -> RangeQuery on a
  fast-field column (query_grammar.rs:455-483)
* `field: IN [v1 v2]` -> TermSetQuery (query_grammar.rs:637)
* `field:*` -> ExistsQuery (query_grammar.rs:319-326)

* per-field boost (`set_field_boost`, query_parser.rs:294-300) and
  per-field fuzzy (`set_field_fuzzy`, query_parser.rs:302-318)
* rfc3339 timestamps as range bounds (query_parser.rs:180,576-577) —
  typed at evaluation against the docmap column (operators/search.py
  `_typed_bound`)

Out of scope (structured API covers them): fuzzy/regex literals in the
grammar itself, date *math* (e.g. `now-7d` — not in the reference
grammar either).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from tantivy_spark.functions.analysis import get_analyzer
from tantivy_spark.plans import logical as L


class QueryParserError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    \s*(
        \(| \) |
        [^\s():"]+:/(?:\\.|[^/])*/(?:\^\d+(?:\.\d+)?)?(?=[\s)]|$) |  # field:/regex/[^boost]
        [^\s():]+:\s*IN\s*\[[^\]]*\]   |  # field: IN [v1 v2 ...] set
        [^\s():]+:\s*[\[{][^\]}]*[\]}] |  # field:[a TO b] / {a TO b} range
        (?:[^\s():"]+:)?"(?:[^"\\]|\\.)*"(?:~\d+|\*)?  |  # [field:]"phrase", ~slop or *
        [^\s()]+                        # bare word (may carry +,-,^,field:)
    )
    """,
    re.VERBOSE,
)

_SET_RE = re.compile(r"^([^\s():]+):\s*IN\s*\[([^\]]*)\]$")
_RANGE_RE = re.compile(
    r"^([^\s():]+):\s*([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$")
_ELASTIC_RE = re.compile(r"^([^\s():]+):(>=|<=|>|<)(.+)$")


def _lex(q: str) -> list[str]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


@dataclass
class _Clause:
    occur: L.Occur | None  # None = default
    query: L.Query


@dataclass(frozen=True)
class _JsonScope:
    """A `jsonfield.path` scope: terms are path-prefixed the way the
    `json` analyzer emits them (`path.sub:value`, json_utils.rs)."""

    field: str  # the json field name itself (boost/fuzzy config key)
    path: str   # path inside the json object ("k", "a.b"; "" = root)


def _is_pure_negation(q: L.Query) -> bool:
    return isinstance(q, L.BooleanQuery) and all(
        occur == L.Occur.MUST_NOT for occur, _ in q.clauses
    )


class QueryParser:
    """Parse query strings against one indexed text field.

    `default_conjunction=True` switches the no-operator default to AND
    (QueryParser::set_conjunction_by_default, query_parser.rs:286-289).
    """

    def __init__(self, field: str = "text", tokenizer: str = "default",
                 positions: bool = True, default_conjunction: bool = False,
                 extra_fields: tuple[str, ...] = (),
                 field_boosts: dict[str, float] | None = None,
                 fuzzy_fields: dict[str, tuple] | None = None,
                 json_fields: tuple[str, ...] = ()):
        self.field = field
        self.tokenizer = tokenizer
        self.positions = positions
        self.default_conjunction = default_conjunction
        #: additional indexed fields (IndexConfig.extra_fields):
        #: `f:tok` parses to a scoped TermQuery over the multi-field index
        self.extra_fields = tuple(extra_fields)
        #: per-field boost (QueryParser::set_field_boost,
        #: query_parser.rs:294-300): multiplies every literal of the field
        self.field_boosts = dict(field_boosts or {})
        #: per-field fuzzy config (QueryParser::set_field_fuzzy,
        #: query_parser.rs:302-318): field -> (prefix, distance,
        #: transpose_cost_one); single-token literals of the field parse
        #: to FuzzyTermQuery
        self.fuzzy_fields = dict(fuzzy_fields or {})
        #: JSON dynamic fields (query_parser.rs:516-560
        #: `compute_path_triplets` + json_utils): `jsonfield.path:value`
        #: parses to path-scoped terms `path:value` — the shape the `json`
        #: analyzer emits at indexing
        self.json_fields = tuple(json_fields)
        self.regexes_allowed = False
        self.warnings: list[str] = []

    def set_field_boost(self, field: str, boost: float) -> None:
        """query_parser.rs:294-300 parity."""
        self.field_boosts[field] = float(boost)

    def set_field_fuzzy(self, field: str, prefix: bool, distance: int,
                        transpose_cost_one: bool) -> None:
        """query_parser.rs:302-318 parity."""
        self.fuzzy_fields[field] = (bool(prefix), int(distance),
                                    bool(transpose_cost_one))

    def allow_regexes(self) -> None:
        """Permit `field:/pattern/` regex literals (query_parser.rs:328;
        off by default — a regex in a query string errors otherwise,
        query_parser.rs:873-879)."""
        self.regexes_allowed = True

    # -- public ------------------------------------------------------------
    def parse(self, q: str) -> L.Query:
        self.warnings = []
        tokens = _lex(q)
        if not tokens:
            return L.EmptyQuery()
        query, rest = self._parse_or(tokens)
        if rest:
            raise QueryParserError(f"unbalanced input near {rest[0]!r}")
        return query

    # -- grammar: or_expr := and_expr (OR and_expr)* ------------------------
    def _parse_or(self, toks: list[str]) -> tuple[L.Query, list[str]]:
        left, toks = self._parse_and(toks)
        parts = [left]
        while toks and toks[0] == "OR":
            nxt, toks = self._parse_and(toks[1:])
            parts.append(nxt)
        if len(parts) == 1:
            return parts[0], toks
        clauses = []
        for p in parts:
            if _is_pure_negation(p):
                clauses.extend(p.clauses)
            else:
                clauses.append((L.Occur.SHOULD, p))
        return L.BooleanQuery.new(clauses), toks

    # and_expr := clause_seq (AND clause_seq)*  — AND binds tighter
    def _parse_and(self, toks: list[str]) -> tuple[L.Query, list[str]]:
        left, toks = self._parse_clause_seq(toks)
        parts = [left]
        while toks and toks[0] == "AND":
            nxt, toks = self._parse_clause_seq(toks[1:])
            parts.append(nxt)
        if len(parts) == 1:
            return parts[0], toks
        # `a AND NOT b` (query_grammar.rs:790): a pure-negation part folds
        # into the enclosing boolean as must_not rather than nesting a
        # match-nothing MustNot-only subquery
        clauses = []
        for p in parts:
            if _is_pure_negation(p):
                clauses.extend(p.clauses)
            else:
                clauses.append((L.Occur.MUST, p))
        return L.BooleanQuery.new(clauses), toks

    # clause_seq := clause+ until OR/AND/) — whitespace juxtaposition
    def _parse_clause_seq(self, toks: list[str]) -> tuple[L.Query, list[str]]:
        clauses: list[_Clause] = []
        consumed = 0
        while toks and toks[0] not in ("OR", "AND", ")"):
            c, toks = self._parse_clause(toks)
            consumed += 1
            if c is not None:
                clauses.append(c)
        if not clauses:
            if consumed:  # literals analyzed away (e.g. over-long tokens)
                return L.EmptyQuery(), toks
            raise QueryParserError("expected a clause")
        if len(clauses) == 1 and clauses[0].occur is None:
            return clauses[0].query, toks
        default = L.Occur.MUST if self.default_conjunction else L.Occur.SHOULD
        return (
            L.BooleanQuery.new(
                [(c.occur or default, c.query) for c in clauses]
            ),
            toks,
        )

    def _parse_clause(self, toks: list[str]) -> tuple[_Clause | None, list[str]]:
        tok = toks[0]
        occur = None
        if tok == "NOT" and len(toks) > 1:
            # `NOT x` == `-x` (query_grammar.rs:790 negate)
            c, rest = self._parse_clause(toks[1:])
            if c is None:
                return None, rest
            return _Clause(L.Occur.MUST_NOT, c.query), rest
        if tok in ("+", "-") and len(toks) > 1 and toks[1] == "(":
            occur = L.Occur.MUST if tok == "+" else L.Occur.MUST_NOT
            toks = toks[1:]
            tok = toks[0]
        elif tok.startswith("+") and len(tok) > 1:
            occur, tok = L.Occur.MUST, tok[1:]
        elif tok.startswith("-") and len(tok) > 1:
            occur, tok = L.Occur.MUST_NOT, tok[1:]

        if tok == "(":
            inner, rest = self._parse_or(toks[1:])
            if not rest or rest[0] != ")":
                raise QueryParserError("missing closing paren")
            boost, rest = self._maybe_group_boost(rest[1:])
            q = L.BoostQuery(inner, boost) if boost != 1.0 else inner
            return _Clause(occur, q), rest

        rest = toks[1:]
        boost = 1.0
        m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", tok)
        if m and not tok.startswith('"'):
            tok, boost = m.group(1), float(m.group(2))

        if tok == "*":
            q: L.Query = L.AllQuery()
        elif tok.startswith('"') or re.match(r'^[^\s():"]+:"', tok):
            scope = None
            if not tok.startswith('"'):
                field, _, tok = tok.partition(":")
                if (jp := self._json_path(field)) is not None:
                    scope = _JsonScope(field.split(".", 1)[0], jp)
                elif field in self.extra_fields:
                    scope = field
                elif field != self.field:
                    raise QueryParserError(
                        f"unknown field {field!r}; indexed fields are "
                        f"{(self.field,) + self.extra_fields!r}"
                    )
            q = self._parse_phrase(tok, scope=scope)
        elif (ms := _SET_RE.match(tok)) is not None:
            # `field: IN [v1 v2]` -> TermSetQuery (query_grammar.rs:637)
            field, body = ms.group(1), ms.group(2)
            if field != self.field:
                raise QueryParserError(
                    f"IN set on unknown field {field!r}; indexed text field "
                    f"is {self.field!r}"
                )
            terms = []
            for w in body.split():
                toks_w, _ = get_analyzer(self.tokenizer)(w)
                terms.extend(toks_w)
            q = L.TermSetQuery(tuple(sorted(set(terms)))) if terms else L.EmptyQuery()
        elif (mr := _RANGE_RE.match(tok)) is not None:
            # `field:[a TO b]` / `{a TO b}` (query_grammar.rs:455-457)
            field, lo_d, lo, hi, hi_d = mr.groups()
            q = L.RangeQuery(
                field,
                lower=None if lo == "*" else lo,
                upper=None if hi == "*" else hi,
                lower_inclusive=lo_d == "[",
                upper_inclusive=hi_d == "]",
            )
        elif (me := _ELASTIC_RE.match(tok)) is not None:
            # `field:>=v` elastic unbounded range (query_grammar.rs:468-483)
            field, op, val = me.groups()
            q = L.RangeQuery(
                field,
                lower=val if op in (">", ">=") else None,
                upper=val if op in ("<", "<=") else None,
                lower_inclusive=op == ">=",
                upper_inclusive=op == "<=",
            )
        elif re.match(r"^[^\s():]+:\*$", tok):
            # `field:*` -> ExistsQuery (query_grammar.rs:319-326)
            q = L.ExistsQuery(tok[:-2])
        else:
            scope = None
            if ":" in tok:
                field, _, tok = tok.partition(":")
                if len(tok) >= 2 and tok.startswith("/") and tok.endswith("/"):
                    # `field:/pattern/` regex literal (query_grammar.rs:703,
                    # `\/` escape); gated + field-required like the
                    # reference (query_parser.rs:865-885)
                    if not self.regexes_allowed:
                        raise QueryParserError("Regex queries are not allowed")
                    if field != self.field and field not in self.extra_fields:
                        raise QueryParserError(
                            f"regex on unknown field {field!r}")
                    pattern = tok[1:-1].replace("\\/", "/")
                    q = L.RegexQuery(pattern)
                    if boost != 1.0:
                        q = L.BoostQuery(q, boost)
                    return _Clause(occur, q), rest
                if (jp := self._json_path(field)) is not None:
                    scope = _JsonScope(field.split(".", 1)[0], jp)
                elif field in self.extra_fields:
                    scope = field
                elif field != self.field:
                    raise QueryParserError(
                        f"unknown field {field!r}; indexed fields are "
                        f"{(self.field,) + self.extra_fields!r}"
                    )
                m2 = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", tok)
                if m2:
                    tok, boost = m2.group(1), float(m2.group(2))
            q = self._literal(tok, scope=scope)
        if q is None:
            return None, rest
        if boost != 1.0:
            q = L.BoostQuery(q, boost)
        return _Clause(occur, q), rest

    def _maybe_group_boost(self, toks: list[str]) -> tuple[float, list[str]]:
        if toks and re.match(r"^\^(\d+(?:\.\d+)?)$", toks[0]):
            return float(toks[0][1:]), toks[1:]
        return 1.0, toks

    def _json_path(self, field: str) -> str | None:
        """`props` -> "", `props.k.sub` -> "k.sub", non-json -> None."""
        for jf in self.json_fields:
            if field == jf:
                return ""
            if field.startswith(jf + "."):
                return field[len(jf) + 1:]
        return None

    def _cfg_key(self, scope) -> str:
        """Field name used for boost/fuzzy config lookup."""
        if isinstance(scope, _JsonScope):
            return scope.field
        return scope or self.field

    def _field_boost(self, q: L.Query, scope) -> L.Query:
        """Wrap a literal of `scope` (None = default field) in the
        configured field boost.  Multiplies with any query-language `^b`
        (query_parser.rs:296-298: 'the two boosts are multiplied')."""
        fb = self.field_boosts.get(self._cfg_key(scope), 1.0)
        return L.BoostQuery(q, fb) if fb != 1.0 else q

    def _term_or_fuzzy(self, term: str, scope) -> L.Query:
        """Single-term literal -> FuzzyTermQuery when the field has a
        fuzzy config (convert_literal_to_query, query_parser.rs:922-938:
        only Term literals fuzz; phrases never do)."""
        cfg = self.fuzzy_fields.get(self._cfg_key(scope))
        if cfg is None:
            return L.TermQuery(term)
        prefix, distance, transpose_cost_one = cfg
        return L.FuzzyTermQuery(
            term, distance=distance,
            transposition_cost_one=transpose_cost_one, prefix=prefix)

    @staticmethod
    def _scope_terms(terms: list[str], scope) -> list[str]:
        if isinstance(scope, _JsonScope):
            return [f"{scope.path}:{t}" for t in terms]
        if scope is not None:
            return [f"{scope}:{t}" for t in terms]
        return terms

    def _parse_phrase(self, tok: str, scope=None) -> L.Query:
        slop = 0
        m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+)|(\*))?$', tok)
        if not m:
            raise QueryParserError(f"bad phrase literal {tok!r}")
        body = m.group(1).replace('\\"', '"')
        if m.group(2):
            slop = int(m.group(2))
        is_prefix = m.group(3) is not None
        analyzer = "default" if isinstance(scope, _JsonScope) else self.tokenizer
        terms, _ = get_analyzer(analyzer)(body)
        terms = self._scope_terms(terms, scope)
        if not terms:
            return L.EmptyQuery()
        if not self.positions and (len(terms) > 1 or is_prefix):
            raise QueryParserError(
                "phrase query requires an index with positions "
                "(FieldDoesNotHavePositionsIndexed)"
            )
        if is_prefix:
            return self._field_boost(L.PhrasePrefixQuery(tuple(terms)), scope)
        if len(terms) == 1:
            # a one-token quoted phrase is a Term literal in the reference
            # AST, so field-fuzzy applies to it too
            return self._field_boost(self._term_or_fuzzy(terms[0], scope), scope)
        return self._field_boost(L.PhraseQuery(tuple(terms), slop=slop), scope)

    def _literal(self, tok: str, scope=None) -> L.Query | None:
        """Analyze a bare literal (generate_literals_for_str,
        query_parser.rs: multi-token literal -> phrase when positions).
        `scope` prefixes terms with their field (multi-field index) or
        json path (json dynamic field)."""
        analyzer = "default" if isinstance(scope, _JsonScope) else self.tokenizer
        terms, _ = get_analyzer(analyzer)(tok)
        if not terms:
            return None
        terms = self._scope_terms(terms, scope)
        if len(terms) == 1:
            return self._field_boost(self._term_or_fuzzy(terms[0], scope), scope)
        if self.positions:
            return self._field_boost(L.PhraseQuery(tuple(terms)), scope)
        self.warnings.append(
            f"literal {tok!r} analyzed to {len(terms)} tokens but the index "
            "has no positions; degrading to OR of terms"
        )
        return self._field_boost(L.BooleanQuery.union(terms), scope)
