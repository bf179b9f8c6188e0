"""E2E rank-identity gate (FIXTURES.md §2/§4): the full query-set shape —
single-term / 2-3-term OR / 2-3-term AND + edge cases — over a multi-
segment transcripts index, DAAT kernel vs an INDEPENDENT numpy brute-force
BM25 oracle (no engine code in the oracle's scoring path).
"""

import time
from collections import Counter

import numpy as np
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.functions.analysis import tokenize_default
from tantivy_spark.functions.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L
from tantivy_spark.sources.transcripts import transcripts_pdf

F32 = np.float32
N_CONVS = 260
K = 10


@pytest.fixture(scope="module")
def corpus():
    pdf = transcripts_pdf(N_CONVS)
    docs = []  # (conv_id, turn_idx, tokens)
    for r in pdf.itertuples():
        docs.append((r.conv_id, int(r.turn_idx), tokenize_default(r.text)[0]))
    return docs


@pytest.fixture(scope="module")
def engine(spark, tmp_root, corpus):
    pdf = transcripts_pdf(N_CONVS)
    idx = f"{tmp_root}/e2e_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=6, n_term_buckets=8))
    s = Searcher(spark, idx)
    # external key -> (segment_ord, doc_id), for oracle tie-breaking
    addr = {
        (r["conv_id"], r["turn_idx"]): (r["segment_ord"], r["doc_id"])
        for r in s.docmap().select("conv_id", "turn_idx", "segment_ord",
                                   "doc_id").collect()
    }
    return s, addr


def brute_force(corpus, addr, terms, mode, k):
    """Independent f32 BM25: tokenize -> tf -> exact idf/avgdl -> quantized
    dl -> sum over query terms; tantivy tie-break via DocAddress."""
    N = len(corpus)
    total_tokens = sum(len(t) for t in (d[2] for d in corpus))
    avgdl = F32(F32(total_tokens) / F32(N))
    dfs = {t: sum(1 for d in corpus if t in set(d[2])) for t in terms}
    hits = []
    for conv, turn, toks in corpus:
        cnt = Counter(toks)
        if mode == "and" and not all(cnt.get(t, 0) > 0 for t in terms):
            continue
        if mode == "or" and not any(cnt.get(t, 0) > 0 for t in terms):
            continue
        fid = int(fieldnorm_to_id(np.array([len(toks)]))[0])
        dl = F32(FIELD_NORMS_TABLE[fid])
        score = F32(0.0)
        for t in terms:
            tf = cnt.get(t, 0)
            if tf == 0 or dfs[t] == 0:
                continue
            idf = F32(np.log(F32(1.0) + (F32(N - dfs[t]) + F32(0.5)) / (F32(dfs[t]) + F32(0.5))))
            w = F32(idf * F32(2.2))
            norm = F32(F32(1.2) * (F32(0.25) + F32(0.75) * dl / avgdl))
            score = F32(score + F32(w * F32(F32(tf) / F32(F32(tf) + norm))))
        hits.append((score, addr[(conv, turn)], conv, turn))
    hits.sort(key=lambda h: (-h[0], h[1]))
    return hits[:k]


QUERIES = [
    # head / torso / tail single terms
    (["w0"], "or"), (["w17"], "or"), (["w999"], "or"), (["w4242"], "or"),
    # multi-term OR at mixed frequencies
    (["w1", "w2"], "or"), (["w3", "w777"], "or"), (["w12", "w40", "w1500"], "or"),
    (["w0", "w1", "w2"], "or"),
    # conjunctions
    (["w0", "w1"], "and"), (["w2", "w5"], "and"), (["w1", "w3", "w7"], "and"),
    # edge cases: absent term; mixed with absent
    (["zzz_missing"], "or"), (["w1", "zzz_missing"], "or"),
    (["w1", "zzz_missing"], "and"),
    # unicode + digit tokens from the generator
    (["héllo"], "or"), (["grüße", "w9"], "or"),
]


def test_query_set_rank_identical(engine, corpus):
    s, addr = engine
    for terms, mode in QUERIES:
        q = (L.BooleanQuery.intersection(terms) if mode == "and"
             else L.BooleanQuery.union(terms))
        got = [
            ((r["segment_ord"], r["doc_id"]), r["score"])
            for r in s.search(q, k=K, mode="daat", fetch_keys=False).collect()
        ]
        exp = brute_force(corpus, addr, terms, mode, K)
        assert [g[0] for g in got] == [e[1] for e in exp], (terms, mode)
        for (addr_got, sc_got), e in zip(got, exp):
            assert sc_got == pytest.approx(float(e[0]), rel=1e-6), (terms, mode)


def test_query_set_daat_equals_taat(engine):
    s, _ = engine
    for terms, mode in QUERIES[:8]:
        q = (L.BooleanQuery.intersection(terms) if mode == "and"
             else L.BooleanQuery.union(terms))
        daat = [(r["segment_ord"], r["doc_id"]) for r in
                s.search(q, k=K, mode="daat", fetch_keys=False).collect()]
        taat = [(r["segment_ord"], r["doc_id"]) for r in
                s.search(q, k=K, mode="taat64", fetch_keys=False).collect()]
        assert daat == taat, (terms, mode)


@pytest.fixture(scope="module")
def engine_pos(spark, tmp_root):
    pdf = transcripts_pdf(N_CONVS)
    idx = f"{tmp_root}/e2e_pos_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=6, n_term_buckets=8, positions=True))
    s = Searcher(spark, idx)
    addr = {
        (r["conv_id"], r["turn_idx"]): (r["segment_ord"], r["doc_id"])
        for r in s.docmap().select("conv_id", "turn_idx", "segment_ord",
                                   "doc_id").collect()
    }
    return s, addr


def brute_force_phrase(addr, phrase_terms, k):
    """Independent exact-phrase f32 BM25: positions straight from the
    analyzer (pre-RemoveLong ordinals), chain count at consecutive
    positions, weight = (f32 sum of idfs) * (1 + k1)."""
    pdf = transcripts_pdf(N_CONVS)
    docs = []
    for r in pdf.itertuples():
        terms, poss = tokenize_default(r.text)
        docs.append((r.conv_id, int(r.turn_idx), terms, poss))
    N = len(docs)
    total_tokens = sum(len(d[2]) for d in docs)
    avgdl = F32(F32(total_tokens) / F32(N))
    dfs = {t: sum(1 for d in docs if t in set(d[2])) for t in set(phrase_terms)}
    if any(dfs[t] == 0 for t in phrase_terms):
        return []
    idf_sum = F32(0.0)
    for t in phrase_terms:
        idf_sum = F32(idf_sum + F32(np.log(
            F32(1.0) + (F32(N - dfs[t]) + F32(0.5)) / (F32(dfs[t]) + F32(0.5)))))
    w = F32(idf_sum * F32(2.2))
    hits = []
    for conv, turn, terms, poss in docs:
        pos_of = {}
        for t, p in zip(terms, poss):
            pos_of.setdefault(t, set()).add(p)
        starts = pos_of.get(phrase_terms[0], set())
        count = sum(
            1 for p in starts
            if all((p + i) in pos_of.get(t, set())
                   for i, t in enumerate(phrase_terms[1:], start=1))
        )
        if count == 0:
            continue
        fid = int(fieldnorm_to_id(np.array([len(terms)]))[0])
        dl = F32(FIELD_NORMS_TABLE[fid])
        norm = F32(F32(1.2) * (F32(0.25) + F32(0.75) * dl / avgdl))
        score = F32(w * F32(F32(count) / F32(F32(count) + norm)))
        hits.append((score, addr[(conv, turn)]))
    hits.sort(key=lambda h: (-h[0], h[1]))
    return hits[:k]


def test_phrase_rank_identical_vs_independent_oracle(engine_pos):
    s, addr = engine_pos
    phrases = [("w0", "w1"), ("w1", "w0"), ("w2", "w0", "w1"),
               ("w17", "w3"), ("w0", "zzz_missing")]
    checked = 0
    for terms in phrases:
        got = [
            ((r["segment_ord"], r["doc_id"]), r["score"])
            for r in s.search(L.PhraseQuery(terms), k=K, mode="daat",
                              fetch_keys=False).collect()
        ]
        exp = brute_force_phrase(addr, list(terms), K)
        assert [g[0] for g in got] == [e[1] for e in exp], terms
        for (a, sc), e in zip(got, exp):
            assert sc == pytest.approx(float(e[0]), rel=1e-6), terms
        if exp:
            checked += 1
    assert checked >= 3  # the query set must actually exercise matches
