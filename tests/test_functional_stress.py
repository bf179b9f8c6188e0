"""Randomized functional stress — the analogue of the reference's
src/functional_test.rs:23-60: a random interleaving of add / delete_term /
commit / rollback / merge against a live index, with a pure-Python model
asserting per-term visibility after the run.

Engine delete semantics (documented in writer.py): delete_term writes the
tombstone immediately and it hides EVERY doc containing the term at query
time — including docs committed later — until a merge expunges them.
Rollback drops only buffered adds.  The model mirrors exactly that."""

import numpy as np

from tantivy_spark.plans import logical as L
from tantivy_spark.writer import Index

VOCAB = ["red", "green", "blue", "cyan", "teal", "plum"]


def test_functional_random_ops(spark, tmp_root):
    rng = np.random.default_rng(23)
    idx = Index(spark, f"{tmp_root}/functional_idx")
    w = idx.writer()

    committed: dict[str, set[str]] = {}  # conv_id -> terms
    pending: list[tuple[str, str]] = []
    tombstoned: set[str] = set()
    next_id = 0
    commits = 0

    # seed segment so tombstone writes always have an index dir
    w.add_document({"conv_id": "seed0", "turn_idx": 0, "text": "red green"})
    w.commit()
    committed["seed0"] = {"red", "green"}
    commits += 1

    for _ in range(40):
        op = rng.choice(["add", "delete", "commit", "rollback"],
                        p=[0.55, 0.15, 0.22, 0.08])
        if op == "add":
            n = int(rng.integers(1, 4))
            text = " ".join(rng.choice(VOCAB, size=n))
            cid = f"d{next_id:04d}"
            next_id += 1
            w.add_document({"conv_id": cid, "turn_idx": 0, "text": text})
            pending.append((cid, text))
        elif op == "delete":
            term = str(rng.choice(VOCAB))
            w.delete_term(term)
            tombstoned.add(term)
        elif op == "commit":
            w.commit()
            for cid, text in pending:
                committed[cid] = set(text.split())
            pending.clear()
            commits += 1
        else:
            w.rollback()
            pending.clear()

    w.commit()
    for cid, text in pending:
        committed[cid] = set(text.split())
    pending.clear()
    commits += 1
    assert commits >= 3

    s = idx.searcher()
    visible_model = {
        cid for cid, terms in committed.items() if not (terms & tombstoned)
    }
    got_all = {
        r["conv_id"]
        for r in s.search(L.AllQuery(), k=10_000, mode="taat64").collect()
    }
    # AllQuery scans the docmap; tombstoned docs are still physically
    # present until merge, so compare per-term (the search paths apply
    # tombstones) and then after a merge compare the full doc set.
    for term in VOCAB:
        got = {
            r["conv_id"]
            for r in s.search(L.TermQuery(term), k=10_000, mode="taat64").collect()
        }
        expect = (
            set()
            if term in tombstoned
            else {c for c in visible_model if term in committed[c]}
        )
        assert got == expect, term

    # merge expunges physically; afterwards the full doc set matches
    from tantivy_spark.operators.merge import merge_segments

    merge_segments(spark, idx.index_dir)
    s2 = idx.searcher()
    got_after = {
        r["conv_id"]
        for r in s2.search(L.AllQuery(), k=10_000, mode="taat64").collect()
    }
    assert got_after == visible_model
    assert s2.total_docs == len(visible_model)
    assert got_after <= got_all  # merge only removes docs
