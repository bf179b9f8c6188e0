"""Shared filter-predicate AST (plans/predicate.py): parser, validation,
and CROSS-ENGINE parity — the Catalyst compilation and the pandas
compilation must keep the same rows, including Spark's three-valued
null semantics under not/and/or."""

import numpy as np
import pandas as pd
import pytest

from tantivy_spark.plans import predicate as P


def test_parse_comparisons():
    assert P.parse("token_count > 30") == ["gt", "token_count", 30]
    assert P.parse("a == 'x'") == ["eq", "a", "x"]
    assert P.parse('a = "x"') == ["eq", "a", "x"]   # = normalized
    assert P.parse("a != 1.5") == ["ne", "a", 1.5]
    assert P.parse("a <= -2") == ["le", "a", -2]
    assert P.parse("flag == true") == ["eq", "flag", True]


def test_parse_boolean_structure():
    ast = P.parse("a > 1 and (b in ('x', 'y') or not c == 2)")
    assert ast == ["and", ["gt", "a", 1],
                   ["or", ["in", "b", ["x", "y"]],
                    ["not", ["eq", "c", 2]]]]
    assert P.parse("a not in [1, 2]") == ["not", ["in", "a", [1, 2]]]
    # case-insensitive keywords
    assert P.parse("a > 1 AND NOT b < 2") == \
        ["and", ["gt", "a", 1], ["not", ["lt", "b", 2]]]


def test_fields_inferred():
    assert P.fields(P.parse("a > 1 and (b in ('x') or not c == 2)")) == \
        {"a", "b", "c"}


@pytest.mark.parametrize("bad", [
    "a LIKE 'x%'",            # unsupported operator word -> field field
    "a > b",                  # field-to-field comparison
    "a == null",
    "a >",                    # dangling
    "(a > 1",                 # unbalanced
    "a > 1 extra",            # trailing tokens
    "~weird",                 # untokenizable
    "in (1, 2)",              # missing field
])
def test_parse_rejects(bad):
    with pytest.raises(P.PredicateError):
        P.parse(bad)


@pytest.mark.parametrize("bad_ast", [
    [],
    ["like", "a", "x"],
    ["eq", "a"],
    ["eq", "a", None],
    ["eq", "a", [1, 2]],
    ["in", "a", []],
    ["in", "a", [None]],
    ["not", ["gt", "a", 1], ["gt", "b", 1]],
    "a > 1 and",              # validate() only takes ASTs
])
def test_validate_rejects(bad_ast):
    with pytest.raises(P.PredicateError):
        P.validate(bad_ast)


_PDF = pd.DataFrame({
    "n": [1, 5, 30, 60, None, 7],
    "role": ["user", "agent", None, "user", "agent", "tool"],
    "f": [0.5, 1.5, None, 2.5, 3.5, -1.0],
})

_CONDS = [
    "n > 4",
    "n <= 5 or n >= 60",
    "role == 'user'",
    "role != 'user'",                   # null role must DROP (Spark)
    "not role == 'user'",               # ditto, through not
    "role in ('user', 'tool')",
    "not (n > 4 and role == 'agent')",
    "f < 1.0 or role == 'agent'",       # null f, non-null role
    ["and", ["gt", "n", 0], ["not", ["in", "role", ["tool"]]]],
]


@pytest.mark.parametrize("cond", _CONDS)
def test_spark_pandas_parity(spark, cond):
    ast = P.as_ast(cond)
    sdf = spark.createDataFrame(
        _PDF.astype({"n": "object"}).where(pd.notna(_PDF), None),
        "n long, role string, f double")
    spark_rows = sorted(
        ((r["n"], r["role"], r["f"])
         for r in sdf.filter(P.to_spark(ast)).collect()), key=str)
    mask = P.to_pandas_mask(ast, _PDF)
    kept = _PDF[mask]
    pandas_rows = sorted(
        ((None if pd.isna(n) else int(n), r if isinstance(r, str) else None,
          None if pd.isna(f) else float(f))
         for n, r, f in zip(kept["n"], kept["role"], kept["f"])), key=str)
    assert spark_rows == pandas_rows, f"cond {cond!r}"


def test_pandas_unknown_field():
    with pytest.raises(P.PredicateError, match="unknown field"):
        P.to_pandas_mask(P.parse("zz > 1"), _PDF)


def test_null_rows_dropped_under_not():
    """The pandas.eval replacement exists for exactly this: plain numpy
    ~(role == 'user') KEEPS null-role rows; Spark drops them."""
    mask = P.to_pandas_mask(P.parse("not role == 'user'"), _PDF)
    assert not mask[2]                   # the null-role row
    assert list(mask) == [False, True, False, False, True, True]
    mask_ne = P.to_pandas_mask(P.parse("role != 'user'"), _PDF)
    assert list(mask_ne) == list(mask)


def test_error_is_identical_on_both_engines(spark):
    """An unsupported predicate raises the SAME error from both
    aggregation engines — the divergence-by-exception trap is gone."""
    from tantivy_spark.operators.agg_local import _filter
    from tantivy_spark.operators.aggregations import filter_agg

    sdf = spark.createDataFrame(_PDF.where(pd.notna(_PDF), None)
                                .astype({"n": "object"}),
                                "n long, role string, f double")
    errs = []
    for run in (lambda: filter_agg(sdf, "role like 'u%'",
                                   {"m": {"avg": {"field": "n"}}}),
                lambda: _filter(_PDF, {"condition": "role like 'u%'"},
                                {"m": {"avg": {"field": "n"}}})):
        with pytest.raises(P.PredicateError) as ei:
            run()
        errs.append(str(ei.value))
    assert errs[0] == errs[1]
