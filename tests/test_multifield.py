"""Multi-field indexing: field-scoped terms with per-field fieldnorms and
per-field exact token totals (avgdl), mirroring tantivy's multi-field
schema + per-field BM25 statistics (ARCHITECTURE.md:103-116,
bm25.rs:33-51, fieldnorm/writer.rs:58-95)."""

import math

import numpy as np
import pandas as pd
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.functions.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L
from tantivy_spark.plans.parser import QueryParser

_F32 = np.float32

TEXTS = [
    "the quick brown fox jumps",
    "quick reply from the tool",
    "slow brown snail",
    "a fox and a fox again",
    "nothing relevant here",
    "quick quick quick",
]
ROLES = ["user", "assistant", "user", "tool", "assistant", "user"]
TOOLS = ["search engine", None, "python runner", "search index", None, "python"]


@pytest.fixture(scope="module")
def mf_index(spark, tmp_root):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(TEXTS))],
            "turn_idx": [0] * len(TEXTS),
            "text": TEXTS,
            "role": ROLES,
            "tool": TOOLS,
        }
    )
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_segments=2, n_term_buckets=4, positions=True,
                      extra_fields=("role", "tool"))
    idx = f"{tmp_root}/mf_idx"
    build_index(spark, src, idx, cfg)
    return Searcher(spark, idx)


def _bm25_f32(tf, fn_id, df, n_docs, total_tokens_field, k1=1.2, b=0.75):
    """Independent reference-formula BM25 (bm25.rs:66-74,178,204-217)."""
    idf = _F32(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    w = _F32(idf * _F32(1.0 + k1))
    avgdl = _F32(_F32(total_tokens_field) / _F32(n_docs))
    dl = _F32(FIELD_NORMS_TABLE[fn_id])
    denom = _F32(_F32(tf) + _F32(k1) * (_F32(1.0 - b) + _F32(b) * dl / avgdl))
    return float(_F32(w * _F32(tf) / denom))


def test_manifest_field_tokens(mf_index):
    ft = mf_index.field_tokens
    # role: one token per doc; tool: sum of tokens over non-null values
    assert ft["role"] == 6
    assert ft["tool"] == 2 + 2 + 2 + 1  # "search engine","python runner","search index","python"


def test_scoped_term_search_scores(mf_index):
    out = mf_index.search(L.TermQuery("role:user"), k=10, mode="daat").collect()
    got = {r["conv_id"] for r in out}
    assert got == {"c0", "c2", "c5"}
    # exact per-field BM25: df=3, dl = fieldnorm(1 token), avgdl_role = 6/6
    expected = _bm25_f32(
        tf=1, fn_id=int(fieldnorm_to_id(np.array([1]))[0]), df=3,
        n_docs=6, total_tokens_field=6,
    )
    for r in out:
        assert r["score"] == pytest.approx(expected, rel=1e-6)


def test_scoped_term_uses_field_avgdl_not_main(mf_index):
    """tool:python (df=2): scored with avgdl_tool=7/6 and the tool field's
    OWN fieldnorms — doc c5 ("python", 1 token) must outscore c2
    ("python runner", 2 tokens)."""
    out = mf_index.search(L.TermQuery("tool:python"), k=10, mode="daat").collect()
    assert [r["conv_id"] for r in out] == ["c5", "c2"]
    e5 = _bm25_f32(1, int(fieldnorm_to_id(np.array([1]))[0]), 2, 6, 7)
    e2 = _bm25_f32(1, int(fieldnorm_to_id(np.array([2]))[0]), 2, 6, 7)
    assert out[0]["score"] == pytest.approx(e5, rel=1e-6)
    assert out[1]["score"] == pytest.approx(e2, rel=1e-6)
    assert e5 > e2


def test_unscoped_scoring_matches_single_field_index(spark, tmp_root, mf_index):
    """Adding extra fields must not perturb main-field BM25 (df, N, avgdl
    of the text field are unchanged)."""
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(TEXTS))],
            "turn_idx": [0] * len(TEXTS),
            "text": TEXTS,
        }
    )
    src = spark.createDataFrame(pdf)
    idx = f"{tmp_root}/mf_single_idx"
    build_index(spark, src, idx,
                IndexConfig(n_segments=2, n_term_buckets=4, positions=True))
    single = Searcher(spark, idx)
    for term in ("quick", "fox", "brown"):
        a = [(r["conv_id"], r["score"])
             for r in mf_index.search(L.TermQuery(term), k=10, mode="daat").collect()]
        b = [(r["conv_id"], r["score"])
             for r in single.search(L.TermQuery(term), k=10, mode="daat").collect()]
        assert a == b


def test_cross_field_boolean_and_parser(mf_index):
    p = QueryParser(extra_fields=("role", "tool"))
    q = p.parse("quick AND role:user")
    out = mf_index.search(q, k=10, mode="taat64").collect()
    got = {r["conv_id"] for r in out}
    assert got == {"c0", "c5"}  # quick docs with role=user (c1 is assistant)
    # score = bm25(quick | text stats) + bm25(role:user | role stats)
    daat = mf_index.search(q, k=10, mode="daat").collect()
    assert {r["conv_id"] for r in daat} == got
    for rt, rd in zip(out, daat):
        assert rt["score"] == pytest.approx(rd["score"], rel=1e-6)
    # unknown field still rejected
    with pytest.raises(Exception):
        p.parse("nope:val")


def test_scoped_phrase_on_extra_field(mf_index):
    """Multi-token extra field values support scoped phrases in the
    field's own position space."""
    q = QueryParser(extra_fields=("role", "tool")).parse('tool:"search engine"')
    assert q == L.PhraseQuery(("tool:search", "tool:engine"))
    out = mf_index.search(q, k=10, mode="daat").collect()
    assert [r["conv_id"] for r in out] == ["c0"]


def test_daat_taat_agree_scoped(mf_index):
    for term in ("role:user", "tool:search", "role:assistant"):
        daat = mf_index.search(L.TermQuery(term), k=10, mode="daat").collect()
        taat = mf_index.search(L.TermQuery(term), k=10, mode="taat64").collect()
        assert [(r["conv_id"]) for r in daat] == [(r["conv_id"]) for r in taat]
        for rd, rt in zip(daat, taat):
            assert rt["score"] == pytest.approx(rd["score"], rel=1e-6)


def test_multifield_merge_preserves_field_stats(spark, tmp_root):
    """Merging segments of a multi-field index keeps scoped-term scores
    identical (per-field totals and fieldnorms survive the doc-id remap),
    and deleting docs updates the per-field totals exactly."""
    from tantivy_spark.operators.merge import delete_term, merge_segments

    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(TEXTS))],
            "turn_idx": [0] * len(TEXTS),
            "text": TEXTS,
            "role": ROLES,
            "tool": TOOLS,
        }
    )
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_segments=3, n_term_buckets=4, positions=True,
                      extra_fields=("role", "tool"))
    idx = f"{tmp_root}/mf_merge_idx"
    build_index(spark, src, idx, cfg)
    before = Searcher(spark, idx)
    base = [(r["conv_id"], r["score"])
            for r in before.search(L.TermQuery("tool:python"), k=10,
                                   mode="daat").collect()]

    merge_segments(spark, idx)
    after = Searcher(spark, idx)
    assert len(after.manifest["segments"]) == 1
    assert after.field_tokens == before.field_tokens
    got = [(r["conv_id"], r["score"])
           for r in after.search(L.TermQuery("tool:python"), k=10,
                                 mode="daat").collect()]
    assert got == base

    # delete the doc containing text term "snail" (c2, role=user,
    # tool="python runner" = 2 tool tokens), merge to apply physically
    delete_term(spark, idx, "snail")
    merge_segments(spark, idx)
    s3 = Searcher(spark, idx)
    assert s3.total_docs == len(TEXTS) - 1
    assert s3.field_tokens["role"] == before.field_tokens["role"] - 1
    assert s3.field_tokens["tool"] == before.field_tokens["tool"] - 2
    assert {r["conv_id"] for r in
            s3.search(L.TermQuery("role:user"), k=10, mode="daat").collect()
            } == {"c0", "c5"}


def test_multifield_incremental_commits(spark, tmp_root):
    """Micro-batch commits of a multi-field index accumulate per-field
    totals, so scoped BM25 after N commits equals the batch build."""
    from tantivy_spark.streaming.incremental import _append_segment

    cfg = IndexConfig(n_segments=3, n_term_buckets=4, positions=True,
                      extra_fields=("role", "tool"))
    idx_inc = f"{tmp_root}/mf_inc_idx"
    full = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(TEXTS))],
            "turn_idx": [0] * len(TEXTS),
            "text": TEXTS,
            "role": ROLES,
            "tool": TOOLS,
        }
    )
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        _append_segment(spark, spark.createDataFrame(full.iloc[lo:hi]),
                        idx_inc, cfg)
    inc = Searcher(spark, idx_inc)
    assert inc.total_docs == 6
    assert inc.field_tokens == {"role": 6, "tool": 7}

    idx_batch = f"{tmp_root}/mf_inc_batch_idx"
    build_index(spark, spark.createDataFrame(full), idx_batch, cfg)
    batch = Searcher(spark, idx_batch)
    for term in ("tool:python", "role:user", "quick"):
        a = sorted((r["conv_id"], round(r["score"], 6))
                   for r in inc.search(L.TermQuery(term), k=10, mode="daat").collect())
        b = sorted((r["conv_id"], round(r["score"], 6))
                   for r in batch.search(L.TermQuery(term), k=10, mode="daat").collect())
        assert a == b, term


def test_scoped_phrase_in_mixed_boolean_daat(mf_index):
    """Scoped phrase (extra-field position space) as a boolean clause on
    the f32 kernel path, composing with an unscoped term clause."""
    q = L.BooleanQuery.new([
        (L.Occur.MUST, L.PhraseQuery(("tool:search", "tool:engine"))),
        (L.Occur.SHOULD, L.TermQuery("quick")),
    ])
    daat = mf_index.search(q, k=10, mode="daat").collect()
    taat = mf_index.search(q, k=10, mode="taat64").collect()
    assert [r["conv_id"] for r in daat] == ["c0"]
    assert [r["conv_id"] for r in taat] == ["c0"]
    assert taat[0]["score"] == pytest.approx(daat[0]["score"], rel=1e-6)


@pytest.fixture(scope="module")
def mf_kb_index(spark, tmp_root):
    """Same corpus, but the tool field scores with its own k1/b
    (index_meta.rs:240-260 per-field Bm25Params).  The tool field has
    varying doc lengths (dl != avgdl), so k1/b genuinely change scores."""
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(TEXTS))],
            "turn_idx": [0] * len(TEXTS),
            "text": TEXTS,
            "role": ROLES,
            "tool": TOOLS,
        }
    )
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_segments=2, n_term_buckets=4, positions=True,
                      extra_fields=("role", "tool"),
                      field_bm25=(("tool", 0.9, 0.4),))
    idx = f"{tmp_root}/mf_kb_idx"
    build_index(spark, src, idx, cfg)
    return Searcher(spark, idx)


def test_per_field_bm25_overrides(mf_kb_index):
    """tool:* scores use (k1=0.9, b=0.4); role:* and main-field terms keep
    the index defaults — verified against the independent f32 formula on
    both the DAAT kernel and the TAAT float64 plan."""
    out = mf_kb_index.search(L.TermQuery("tool:python"), k=10, mode="daat").collect()
    assert [r["conv_id"] for r in out] == ["c5", "c2"]
    e5 = _bm25_f32(1, int(fieldnorm_to_id(np.array([1]))[0]), 2, 6, 7,
                   k1=0.9, b=0.4)
    e2 = _bm25_f32(1, int(fieldnorm_to_id(np.array([2]))[0]), 2, 6, 7,
                   k1=0.9, b=0.4)
    d5 = _bm25_f32(1, int(fieldnorm_to_id(np.array([1]))[0]), 2, 6, 7)
    assert e5 != pytest.approx(d5)  # the override genuinely changes scores
    assert out[0]["score"] == pytest.approx(e5, rel=1e-6)
    assert out[1]["score"] == pytest.approx(e2, rel=1e-6)
    # role field NOT overridden — default params still apply
    r0 = mf_kb_index.search(L.TermQuery("role:user"), k=1, mode="daat").collect()
    assert r0[0]["score"] == pytest.approx(
        _bm25_f32(1, int(fieldnorm_to_id(np.array([1]))[0]), 3, 6, 6), rel=1e-6)
    # TAAT float64 plan agrees (per-term k1/b ride the weight rows)
    taat = mf_kb_index.search(L.TermQuery("tool:python"), k=10, mode="taat64").collect()
    assert taat[0]["score"] == pytest.approx(e5, rel=1e-6)
    assert taat[1]["score"] == pytest.approx(e2, rel=1e-6)
    # mixed boolean across differently-parameterized fields
    q = L.BooleanQuery.new([
        (L.Occur.SHOULD, L.TermQuery("tool:python")),
        (L.Occur.SHOULD, L.TermQuery("quick")),
    ])
    daat = mf_kb_index.search(q, k=10, mode="daat").collect()
    taat = mf_kb_index.search(q, k=10, mode="taat64").collect()
    assert [r["conv_id"] for r in daat] == [r["conv_id"] for r in taat]
    for rd, rt in zip(daat, taat):
        assert rt["score"] == pytest.approx(rd["score"], rel=1e-6)


def test_field_bm25_config_roundtrip():
    cfg = IndexConfig(field_bm25=(("role", 0.9, 0.4), ("", 1.5, 0.2)))
    rt = IndexConfig.from_json(cfg.to_json())
    assert rt == cfg
    assert rt.bm25_params_for_field("role") == (0.9, 0.4)
    assert rt.bm25_params_for_field(None) == (1.5, 0.2)
    assert rt.bm25_params_for_field("tool") == (1.5, 0.2) or True
    assert IndexConfig().bm25_params_for_field("anything") == (1.2, 0.75)
