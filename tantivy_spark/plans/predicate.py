"""Shared filter-predicate AST for the `filter` bucket aggregation.

The distributed engine used to hand condition strings to `F.expr`
(Spark SQL) while the serving mirror handed them to `pandas.eval` —
two dialects whose overlap happened to cover the common cases and
whose divergence surfaced only as an exception on one engine.  This
module removes the trap: ONE portable predicate language, compiled to
a Catalyst Column on the distributed engine and to a pandas boolean
mask on the serving engine, with IDENTICAL validation errors on both.

Forms accepted as a `filter` condition on both engines:

* an AST list: ``["and", ["gt", "token_count", 30],
  ["in", "role", ["user", "assistant"]]]`` — ops ``eq ne lt le gt ge``
  (field, literal), ``in`` (field, [literals]), ``and or`` (n-ary),
  ``not`` (unary).
* a string in the portable dialect, parsed here:
  ``token_count > 30 and (role in ('user', 'assistant') or not
  lang == 'en')`` — comparisons ``== != < <= > >=`` (``=`` is
  normalized to ``==``), ``in (..)`` / ``in [..]``, ``and/or/not``
  (case-insensitive), parentheses, number / 'single'- or
  "double"-quoted string / true / false literals.
* engine-native escape hatches keep working where they always did: a
  Catalyst Column on the distributed engine, a callable(pdf) -> mask
  on the serving engine.

NULL semantics follow Spark (the reference's fast-field columns are
nullable): a comparison against a null value is UNKNOWN, and/or/not
combine with three-valued (Kleene) logic, and the final filter drops
UNKNOWN rows.  The pandas compilation uses the nullable ``boolean``
dtype — whose ``& | ~`` are Kleene by contract — then fills NA with
False, so ``not (role == 'x')`` drops null-role rows on BOTH engines
(plain numpy ``~False`` would keep them on one).
"""

from __future__ import annotations

import re

_CMP_OPS = {"eq": "==", "ne": "!=", "lt": "<", "le": "<=",
            "gt": ">", "ge": ">="}
_BOOL_OPS = {"and", "or"}


class PredicateError(ValueError):
    """Unsupported or malformed filter predicate — same type and
    message on both engines."""


# --------------------------------------------------------------------------
# validation (shared — runs before either compilation)
# --------------------------------------------------------------------------

def validate(ast) -> None:
    if not isinstance(ast, (list, tuple)) or not ast:
        raise PredicateError(
            f"predicate node must be a non-empty list [op, ...], "
            f"got {ast!r}")
    op = ast[0]
    if op in _BOOL_OPS:
        if len(ast) < 2:
            raise PredicateError(f"{op!r} needs at least one operand")
        for sub in ast[1:]:
            validate(sub)
        return
    if op == "not":
        if len(ast) != 2:
            raise PredicateError("'not' takes exactly one operand")
        validate(ast[1])
        return
    if op in _CMP_OPS:
        if len(ast) != 3 or not isinstance(ast[1], str):
            raise PredicateError(
                f"{op!r} takes (field, literal), got {ast!r}")
        if ast[2] is None:
            raise PredicateError(
                "comparison against null is always UNKNOWN — "
                "filter on a non-null literal")
        if isinstance(ast[2], (list, tuple, dict)):
            raise PredicateError(
                f"comparison literal must be a scalar, got {ast[2]!r}")
        return
    if op == "in":
        if (len(ast) != 3 or not isinstance(ast[1], str)
                or not isinstance(ast[2], (list, tuple)) or not ast[2]):
            raise PredicateError(
                f"'in' takes (field, [literals...]), got {ast!r}")
        if any(v is None or isinstance(v, (list, tuple, dict))
               for v in ast[2]):
            raise PredicateError("'in' literals must be non-null scalars")
        return
    raise PredicateError(
        f"unsupported predicate op {op!r} (supported: "
        f"{sorted(_CMP_OPS)} + ['in', 'and', 'or', 'not'])")


def fields(ast) -> set[str]:
    """Field names the predicate reads — what the serving reader must
    load as fast-field columns (no separate declaration needed)."""
    op = ast[0]
    if op in _BOOL_OPS:
        out: set[str] = set()
        for sub in ast[1:]:
            out |= fields(sub)
        return out
    if op == "not":
        return fields(ast[1])
    return {ast[1]}


# --------------------------------------------------------------------------
# string dialect -> AST (the portable subset both engines accept)
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+|-?\d+)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<cmp>==|!=|<=|>=|=|<|>)
    | (?P<punc>[()\[\],])
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.VERBOSE)


def _tokenize(s: str) -> list[tuple[str, object]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise PredicateError(
                    f"cannot tokenize predicate at {s[i:]!r}")
            break
        i = m.end()
        if m.group("num") is not None:
            t = m.group("num")
            out.append(("lit", float(t) if "." in t else int(t)))
        elif m.group("str") is not None:
            out.append(("lit", m.group("str")[1:-1]))
        elif m.group("cmp") is not None:
            c = m.group("cmp")
            out.append(("cmp", "==" if c == "=" else c))
        elif m.group("punc") is not None:
            out.append((m.group("punc"), m.group("punc")))
        else:
            w = m.group("word")
            lw = w.lower()
            if lw in ("and", "or", "not", "in"):
                out.append((lw, lw))
            elif lw == "true":
                out.append(("lit", True))
            elif lw == "false":
                out.append(("lit", False))
            elif lw == "null":
                raise PredicateError(
                    "null literals are not supported — a comparison "
                    "against null is always UNKNOWN")
            else:
                out.append(("field", w))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None):
        t = self.peek()
        if kind is not None and t[0] != kind:
            raise PredicateError(
                f"expected {kind!r}, got {t[1]!r} in predicate")
        self.i += 1
        return t

    def expr(self):
        node = self.and_expr()
        while self.peek()[0] == "or":
            self.take()
            node = ["or", node, self.and_expr()]
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek()[0] == "and":
            self.take()
            node = ["and", node, self.not_expr()]
        return node

    def not_expr(self):
        if self.peek()[0] == "not":
            self.take()
            return ["not", self.not_expr()]
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if kind == "(":
            self.take()
            node = self.expr()
            self.take(")")
            return node
        if kind != "field":
            raise PredicateError(
                f"expected a field name, got {val!r} in predicate")
        self.take()
        kind2, val2 = self.peek()
        if kind2 == "cmp":
            self.take()
            lkind, lval = self.take()
            if lkind != "lit":
                raise PredicateError(
                    f"expected a literal after {val2!r}, got {lval!r} "
                    "(field-to-field comparison is not supported)")
            rev = {v: k for k, v in _CMP_OPS.items()}
            return [rev[val2], val, lval]
        if kind2 in ("in", "not"):
            neg = False
            if kind2 == "not":
                self.take()
                neg = True
            self.take("in")
            opener, _ = self.take()
            if opener not in ("(", "["):
                raise PredicateError("'in' needs a (..) or [..] list")
            closer = ")" if opener == "(" else "]"
            lits = []
            while True:
                lkind, lval = self.take()
                if lkind != "lit":
                    raise PredicateError(
                        f"'in' list items must be literals, got {lval!r}")
                lits.append(lval)
                nk, _ = self.take()
                if nk == closer:
                    break
                if nk != ",":
                    raise PredicateError("expected ',' in 'in' list")
            node = ["in", val, lits]
            return ["not", node] if neg else node
        raise PredicateError(
            f"expected a comparison or 'in' after field {val!r}")


def parse(condition: str):
    """Portable-dialect string -> AST (validated)."""
    p = _Parser(_tokenize(condition))
    node = p.expr()
    if p.peek()[0] is not None:
        raise PredicateError(
            f"trailing tokens in predicate: {p.peek()[1]!r}")
    validate(node)
    return node


def as_ast(condition):
    """Normalize a string or AST-list condition to a validated AST."""
    if isinstance(condition, str):
        return parse(condition)
    validate(condition)
    return condition


# --------------------------------------------------------------------------
# compilation
# --------------------------------------------------------------------------

def to_spark(ast):
    """AST -> Catalyst Column (Spark's native null semantics ARE the
    contract's)."""
    from functools import reduce

    from pyspark.sql import functions as F

    op = ast[0]
    if op == "and":
        return reduce(lambda a, b: a & b, (to_spark(s) for s in ast[1:]))
    if op == "or":
        return reduce(lambda a, b: a | b, (to_spark(s) for s in ast[1:]))
    if op == "not":
        return ~to_spark(ast[1])
    if op == "in":
        return F.col(ast[1]).isin(list(ast[2]))
    c, lit = F.col(ast[1]), F.lit(ast[2])
    return {"eq": c == lit, "ne": c != lit, "lt": c < lit,
            "le": c <= lit, "gt": c > lit, "ge": c >= lit}[op]


def to_pandas_mask(ast, pdf):
    """AST -> numpy bool mask over a pandas frame, with Spark's
    three-valued null semantics: comparisons on null values yield NA,
    and/or/not combine Kleene (pandas nullable-boolean contract), and
    the final mask drops NA rows."""
    return _pd_eval(ast, pdf).fillna(False).to_numpy(dtype=bool)


def _pd_eval(ast, pdf):
    import pandas as pd

    op = ast[0]
    if op == "and":
        out = _pd_eval(ast[1], pdf)
        for sub in ast[2:]:
            out = out & _pd_eval(sub, pdf)
        return out
    if op == "or":
        out = _pd_eval(ast[1], pdf)
        for sub in ast[2:]:
            out = out | _pd_eval(sub, pdf)
        return out
    if op == "not":
        return ~_pd_eval(ast[1], pdf)
    field = ast[1]
    if field not in pdf.columns:
        raise PredicateError(f"unknown field {field!r} in predicate")
    s = pdf[field]
    if op == "in":
        raw = s.isin(list(ast[2]))
    else:
        lit = ast[2]
        raw = {"eq": s == lit, "ne": s != lit, "lt": s < lit,
               "le": s <= lit, "gt": s > lit, "ge": s >= lit}[op]
    out = pd.Series(raw, dtype="boolean")
    out[s.isna().to_numpy()] = pd.NA        # null operand -> UNKNOWN
    return out
