"""Randomized query-tree equivalence: the f32 DAAT kernel path and the
float64 TAAT DataFrame path must agree on matched docs and scores for
arbitrary boolean compositions — the end-to-end analogue of the
reference's block-WAND proptests (block_wand_union.rs:427-634), run
through the full engine instead of the kernel alone."""

import numpy as np
import pandas as pd
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "rare1", "rare2"]


@pytest.fixture(scope="module")
def rand_index(spark, tmp_root):
    rng = np.random.default_rng(17)
    texts = []
    for _ in range(120):
        n = rng.integers(3, 30)
        # zipf-ish draw so doc_freqs differ a lot across terms
        probs = np.array([0.3, 0.25, 0.15, 0.1, 0.08, 0.07, 0.03, 0.02])
        texts.append(" ".join(rng.choice(VOCAB, size=n, p=probs)))
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:03d}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        }
    )
    idx = f"{tmp_root}/randq_idx"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=3, n_term_buckets=4))
    return Searcher(spark, idx)


def _random_tree(rng, depth=0) -> L.Query:
    kind = rng.choice(
        ["term", "bool", "boost", "dismax", "const"]
        if depth < 2 else ["term"]
    )
    if kind == "term":
        return L.TermQuery(str(rng.choice(VOCAB)))
    if kind == "boost":
        return L.BoostQuery(_random_tree(rng, depth + 1),
                            float(rng.choice([0.5, 2.0, 3.5])))
    if kind == "const":
        return L.ConstScoreQuery(_random_tree(rng, depth + 1),
                                 float(rng.choice([1.0, 2.5])))
    if kind == "dismax":
        n = int(rng.integers(2, 4))
        return L.DisjunctionMaxQuery(
            tuple(_random_tree(rng, depth + 1) for _ in range(n)),
            float(rng.choice([0.0, 0.3])),
        )
    n = int(rng.integers(1, 4))
    clauses = []
    has_positive = False
    for _ in range(n):
        occ = rng.choice(
            [L.Occur.MUST, L.Occur.SHOULD, L.Occur.MUST_NOT], p=[0.35, 0.5, 0.15]
        )
        if occ != L.Occur.MUST_NOT:
            has_positive = True
        clauses.append((occ, _random_tree(rng, depth + 1)))
    if not has_positive:
        clauses.append((L.Occur.SHOULD, _random_tree(rng, depth + 1)))
    return L.BooleanQuery.new(clauses)


def test_random_trees_daat_equals_taat(rand_index):
    rng = np.random.default_rng(99)
    checked = 0
    for _ in range(25):
        q = _random_tree(rng)
        daat = rand_index.search(q, k=200, mode="daat").collect()
        taat = rand_index.search(q, k=200, mode="taat64").collect()
        d = {(r["conv_id"], r["turn_idx"]): r["score"] for r in daat}
        t = {(r["conv_id"], r["turn_idx"]): r["score"] for r in taat}
        assert set(d) == set(t), f"doc sets differ for {q}"
        for key in d:
            assert t[key] == pytest.approx(d[key], rel=1e-5, abs=1e-6), (q, key)
        # rank agreement up to f32-tie reordering: scores sorted desc match
        ds = sorted(d.values(), reverse=True)
        ts = sorted(t.values(), reverse=True)
        for a, b in zip(ds, ts):
            assert b == pytest.approx(a, rel=1e-5, abs=1e-6)
        checked += 1
    assert checked == 25


def test_random_trees_three_engines(rand_index):
    """The Spark-free serving reader joins the equivalence: random
    trees agree across distributed f32 DAAT, distributed f64 TAAT, and
    ServingSearcher on doc sets AND scores.  (A 300-tree one-off sweep
    of the same property ran clean in round 5 — NOTES.md #11; this is
    the always-on guard.)"""
    from tantivy_spark.operators.serve import ServingSearcher

    srv = ServingSearcher(rand_index.index_dir)
    rng = np.random.default_rng(4242)
    for _ in range(10):
        q = _random_tree(rng)
        d = {(r["conv_id"], r["turn_idx"]): r["score"]
             for r in rand_index.search(q, k=200, mode="daat").collect()}
        out = srv.search(q, 200, fetch_keys=True)
        s = {(c, int(t)): float(v) for c, t, v in
             zip(out["conv_id"], out["turn_idx"], out["score"])}
        assert set(d) == set(s), f"doc sets differ for {q}"
        for key in d:
            assert s[key] == pytest.approx(d[key], rel=1e-5, abs=1e-6), \
                (q, key)
