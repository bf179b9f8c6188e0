"""Per-segment exact top-k kernel — batch MaxScore with block skipping.

This is the DAAT side of the engine (tantivy's block-max WAND family,
/root/reference/src/query/boolean_query/block_wand_union.rs:19-130,
block_wand_intersection.rs, weight.rs:58-80).  tantivy walks doc-at-a-time
with a pivot + threshold heap; a per-doc Python loop would violate the
vectorization rule, so we run the *batch* formulation of the same pruning
family (MaxScore / block-max):

* every term carries per-block upper-bound metadata (bm_norm_id, bm_tf) —
  genuine score upper bounds (see blocks.py docstring), so pruning never
  changes the result set: exactly the WAND safety contract the reference's
  proptest asserts (block_wand_union.rs:427-634).
* disjunctions: seed a threshold θ from the highest-impact term's true
  scores (a lower bound on the final k-th score), split terms into
  essential / non-essential by ascending upper-bound prefix sums strictly
  below θ; docs appearing only in non-essential terms score < θ and can
  never enter the top-k, even via tie-break.  Essential terms are decoded
  fully; non-essential terms are *probed* — only blocks containing a
  candidate are decoded (the skip-index `block_last` plays
  src/postings/skip.rs's role, np.searchsorted plays block_search.rs).
* conjunctions: leapfrog from the rarest term, probing the others
  block-selectively (galloping intersection, src/query/intersection.rs).
* scores accumulate in float32 in clause order — the same accumulation the
  brute-force oracle uses, keeping rank-identical f32 semantics.
* ties: equal scores order by ascending (segment_ord, doc_id)
  (src/collector/top_score_collector.rs:28-30,648-655).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tantivy_spark.functions.bm25 import Bm25Weight
from tantivy_spark.operators import blocks

_F32 = np.float32


@dataclass
class TermPostings:
    """One (term, segment) posting list, lazily decoded."""

    term: str
    doc_freq: int
    doc_enc: bytes
    tf_enc: bytes
    fnorm_enc: bytes
    block_last: np.ndarray
    block_doc_off: np.ndarray
    block_tf_off: np.ndarray
    bm_norm_id: np.ndarray
    bm_tf: np.ndarray
    pos_enc: bytes | None = None
    pos_off: np.ndarray | None = None
    # Opt-in decoded-postings memo (serve.py's page-cache posture): the
    # distributed path builds TermPostings per task invocation, so caching
    # there is free but useless; a long-lived ServingSearcher flips this on
    # so repeat queries skip decode entirely.
    cache_decoded: bool = False

    @staticmethod
    def from_row(row) -> "TermPostings":
        has_pos = "pos_enc" in row and isinstance(row["pos_enc"], (bytes, bytearray))
        return TermPostings(
            term=row["term"],
            doc_freq=int(row["doc_freq"]),
            doc_enc=bytes(row["doc_enc"]),
            tf_enc=bytes(row["tf_enc"]),
            fnorm_enc=bytes(row["fnorm_enc"]),
            block_last=np.asarray(row["block_last"], dtype=np.int64),
            block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int32),
            block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int32),
            bm_norm_id=np.asarray(row["bm_norm_id"], dtype=np.int64),
            bm_tf=np.asarray(row["bm_tf"], dtype=np.int64),
            pos_enc=bytes(row["pos_enc"]) if has_pos else None,
            pos_off=np.asarray(row["pos_off"], dtype=np.int32) if has_pos else None,
        )

    def positions_for(self, posting_indices: np.ndarray,
                      tfs_aligned: np.ndarray) -> list[np.ndarray]:
        """In-doc position arrays for the given posting ordinals."""
        if self.pos_enc is None:
            raise ValueError(f"index has no positions for term {self.term!r}")
        return blocks.decode_positions(
            self.pos_enc, self.pos_off, tfs_aligned, posting_indices
        )

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        memo = self.__dict__.get("_decoded")
        if memo is not None:
            return memo
        docs, tfs, _ = blocks.decode_postings(
            self.doc_enc, self.tf_enc, self.block_doc_off, self.block_tf_off,
            self.block_last, self.doc_freq,
        )
        fns = blocks.fnorms_for_blocks(self.fnorm_enc, self.doc_freq)
        if self.cache_decoded:
            self._decoded = (docs, tfs, fns)
        return docs, tfs, fns

    def max_block_score(self, weight: Bm25Weight) -> np.float32:
        """Tightest per-term upper bound from the block-max pairs."""
        return _F32(weight.score(self.bm_norm_id, self.bm_tf).max())

    def block_scores(self, weight: Bm25Weight) -> np.ndarray:
        """Per-block score upper bounds (f32) from the stored block-max
        (fieldnorm_id, tf) pairs — BlockWAND's skip metadata."""
        return weight.score(self.bm_norm_id, self.bm_tf)

    def probe(self, candidates: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(tf, fieldnorm, present) aligned to sorted `candidates`, decoding
        only the blocks that can contain a candidate (block skipping)."""
        memo = self.__dict__.get("_decoded")
        if memo is not None:
            return _align_full(*memo, candidates)
        if self.cache_decoded:
            # long-lived reader: decode once (memoized), align thereafter —
            # repeat probes of a hot term must not re-decode its blocks
            return _align_full(*self.decode_all(), candidates)
        n = len(candidates)
        tf_out = np.zeros(n, dtype=np.int64)
        fn_out = np.zeros(n, dtype=np.int64)
        present = np.zeros(n, dtype=bool)
        if n == 0 or self.doc_freq == 0:
            return tf_out, fn_out, present
        bidx = np.searchsorted(self.block_last, candidates, side="left")
        valid = bidx < len(self.block_last)
        if not valid.any():
            return tf_out, fn_out, present
        need = np.unique(bidx[valid])
        docs, tfs, _ = blocks.decode_postings(
            self.doc_enc, self.tf_enc, self.block_doc_off, self.block_tf_off,
            self.block_last, self.doc_freq, need,
        )
        fns = blocks.fnorms_for_blocks(self.fnorm_enc, self.doc_freq, need)
        pos = np.searchsorted(docs, candidates)
        ok = pos < len(docs)
        hit = np.zeros(n, dtype=bool)
        hit[ok] = docs[pos[ok]] == candidates[ok]
        tf_out[hit] = tfs[pos[hit]]
        fn_out[hit] = fns[pos[hit]].astype(np.int64)
        present[hit] = True
        return tf_out, fn_out, present


def _align_full(docs_t, tfs_t, fns_t, candidates):
    """Align a fully-decoded term to sorted candidates."""
    n = len(candidates)
    tf_out = np.zeros(n, dtype=np.int64)
    fn_out = np.zeros(n, dtype=np.int64)
    present = np.zeros(n, dtype=bool)
    pos = np.searchsorted(docs_t, candidates)
    ok = pos < len(docs_t)
    hit = np.zeros(n, dtype=bool)
    hit[ok] = docs_t[pos[ok]] == candidates[ok]
    tf_out[hit] = tfs_t[pos[hit]]
    fn_out[hit] = fns_t[pos[hit]].astype(np.int64)
    present[hit] = True
    return tf_out, fn_out, present


@dataclass
class ArrayPostings:
    """A materialized in-memory posting list exposing the same interface
    as TermPostings — used to plug a phrase (evaluated per segment into
    docs + phrase counts + fieldnorms) into the boolean kernel as a
    virtual term, the way the reference composes PhraseScorer as just
    another Scorer inside BooleanWeight (boolean_weight.rs)."""

    docs: np.ndarray  # sorted int64
    tfs: np.ndarray
    fns: np.ndarray

    @property
    def doc_freq(self) -> int:
        return len(self.docs)

    def decode_all(self):
        return self.docs, self.tfs, self.fns

    def max_block_score(self, weight: Bm25Weight) -> np.float32:
        if len(self.docs) == 0:
            return _F32(0.0)
        # (min fieldnorm, max tf) — upper bound under any avgdl
        return _F32(
            weight.score(
                np.array([int(self.fns.min())], dtype=np.int64),
                np.array([int(self.tfs.max())], dtype=np.int64),
            )[0]
        )

    def probe(self, candidates: np.ndarray):
        return _align_full(self.docs, self.tfs, self.fns, candidates)



@dataclass
class Clause:
    occur: str  # "must" | "should" | "must_not"
    term: str
    weight: Bm25Weight | None  # None => no postings in this segment (df=0)
    postings: TermPostings | ArrayPostings | None


def _topk_order(candidates: np.ndarray, scores: np.ndarray,
                k: int) -> np.ndarray:
    """Indices of the exact top-k by (score desc, doc asc).

    Every kernel builds `candidates` sorted ascending (np.unique /
    monotone decode + order-preserving masks), so among equal scores the
    earliest index wins the tie.  A partition preselect keeps the final
    lexsort off million-candidate lists: np.partition is O(n), then only
    the <= k survivors are sorted (TopSegmentCollector's heap role,
    src/collector/top_score_collector.rs — same result, batch form)."""
    n = len(candidates)
    kk = min(k, n)
    if kk == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(n)
    if n > 4 * kk + 1024:
        kth = np.partition(scores, n - kk)[n - kk]
        above = np.flatnonzero(scores > kth)
        eq = np.flatnonzero(scores == kth)[: kk - len(above)]
        idx = np.concatenate([above, eq])
    order = np.lexsort((candidates[idx], -scores[idx].astype(np.float64)))[:kk]
    return idx[order]


def _seed_theta(p, weight: Bm25Weight, k: int):
    """EXACT k-th best true score of one posting list -> (θ, full).
    Decodes blocks in descending block-max order and stops once no
    remaining block can raise the running k-th — the θ seed of BlockWAND
    at batch granularity.  Equal to the k-th largest of the fully-decoded
    score array (proof: every score above the running k-th lives in a
    block whose max reaches it, and those are all decoded before the
    stop fires), at a fraction of the decode bytes on skewed lists.

    Flat distributions (uniform doc lengths — block maxes barely vary,
    so θ lands below every block max and nothing can skip) are detected
    after a bounded probe and handled with ONE bulk decode, returned as
    `full` so the caller reuses it for candidates/alignment instead of
    decoding again.  (0.0, None) when fewer than k postings."""
    if p.doc_freq < k:
        return _F32(0.0), None
    if isinstance(p, ArrayPostings) or p.__dict__.get("_decoded") is not None \
            or p.cache_decoded or len(p.block_last) < 32:
        full = p.decode_all()
        s = weight.score(full[2].astype(np.int64), full[1])
        return _F32(np.partition(s, len(s) - k)[len(s) - k]), full
    bms = p.block_scores(weight).astype(np.float64)
    order = np.argsort(-bms, kind="stable")
    pool: list[np.ndarray] = []
    npool = 0
    theta: np.float32 | None = None
    chunk = max(2, (k + 127) // 128 * 2)
    i = 0
    while i < len(order):
        if theta is not None and bms[order[i]] <= float(theta):
            break
        if i >= 16:
            # bounded probe exhausted without a stop: flat distribution,
            # BlockWAND cannot skip here — bulk decode wins
            full = p.decode_all()
            s = weight.score(full[2].astype(np.int64), full[1])
            return _F32(np.partition(s, len(s) - k)[len(s) - k]), full
        need = np.sort(order[i:i + chunk])
        _, tfs, _ = blocks.decode_postings(
            p.doc_enc, p.tf_enc, p.block_doc_off, p.block_tf_off,
            p.block_last, p.doc_freq, need,
        )
        fns = blocks.fnorms_for_blocks(p.fnorm_enc, p.doc_freq, need)
        s = weight.score(fns.astype(np.int64), tfs)
        pool.append(s)
        npool += len(s)
        if npool >= k:
            allsc = np.concatenate(pool) if len(pool) > 1 else pool[0]
            theta = _F32(np.partition(allsc, npool - k)[npool - k])
            pool = [allsc]
        i += chunk
    return (theta if theta is not None else _F32(0.0)), None


def _wand_eps(theta: float, others: float) -> float:
    """Safety margin for BlockWAND skip comparisons: the scorer
    accumulates in f32, whose rounding error is RELATIVE to the summed
    magnitudes (~1e-7/add), so the guard scales with them — an absolute
    epsilon would swamp low-idf terms' tiny scores and silently disable
    pruning for them.  10x margin over the true f32 error."""
    return 1e-5 * (abs(theta) + abs(others))


def _candidate_cut(p, weight: Bm25Weight, limit: float):
    """BlockWAND candidate cut for one posting list -> (docs, full).
    `docs` = sorted doc ids that can still reach the θ bound (blocks with
    bms < limit skipped — src/query/boolean_query/block_wand.rs role at
    batch granularity; callers pre-subtract the other terms' bounds and
    an epsilon guard from θ).  `full` = the (docs, tfs, fns) decode when
    the list was fully decoded anyway (no cut applied), so the caller
    aligns against it without a second decode; None after a real cut."""
    if isinstance(p, ArrayPostings):
        if limit > 0.0 and len(p.docs) and \
                float(p.max_block_score(weight)) < limit:
            return np.empty(0, dtype=np.int64), None
        full = p.decode_all()
        return full[0], full
    if limit <= 0.0 or p.__dict__.get("_decoded") is not None \
            or p.cache_decoded:
        full = p.decode_all()
        return full[0], full
    bms = p.block_scores(weight).astype(np.float64)
    need = np.flatnonzero(bms >= limit)
    if len(need) == len(bms):
        full = p.decode_all()
        return full[0], full
    if len(need) == 0:
        return np.empty(0, dtype=np.int64), None
    docs, _, _ = blocks.decode_postings(
        p.doc_enc, p.tf_enc, p.block_doc_off, p.block_tf_off,
        p.block_last, p.doc_freq, need,
    )
    return docs, None


def _dead_postings(dead: np.ndarray | None) -> ArrayPostings | None:
    """The segment's tombstoned doc ids as a virtual posting list — the
    alive-bitset role (src/fastfield/alive_bitset.rs): exclusion happens
    INSIDE the scorer, so the heap stays k and nothing proportional to
    |dead| leaves the segment task."""
    if dead is None or len(dead) == 0:
        return None
    return ArrayPostings(
        np.asarray(dead, dtype=np.int64),
        np.ones(len(dead), dtype=np.int64),
        np.zeros(len(dead), dtype=np.int64),
    )


def _alive_mask(candidates: np.ndarray,
                dead: np.ndarray | None) -> np.ndarray | None:
    """Boolean mask of candidates NOT present in the sorted dead array;
    None when nothing is dead (skip the masking)."""
    if dead is None or len(dead) == 0 or len(candidates) == 0:
        return None
    idx = np.searchsorted(dead, candidates)
    ok = idx < len(dead)
    hit = np.zeros(len(candidates), dtype=bool)
    hit[ok] = dead[idx[ok]] == candidates[ok]
    if not hit.any():
        return None
    return ~hit


def segment_topk(
    clauses: list[Clause],
    k: int,
    minimum_should_match: int = 0,
    const_score: float | None = None,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of one segment -> (doc_ids, f32 scores), ordered by
    (score desc, doc_id asc).  `dead` = sorted tombstoned doc ids of this
    segment, excluded as an extra must_not clause (which also disables
    the θ-seed prune — removal-unsafe, see below — exactly like a user
    must_not)."""
    dp = _dead_postings(dead)
    if dp is not None:
        clauses = clauses + [Clause("must_not", "__tombstones__", None, dp)]
    musts = [c for c in clauses if c.occur == "must"]
    shoulds = [c for c in clauses if c.occur == "should"]
    must_nots = [c for c in clauses if c.occur == "must_not" and c.postings is not None]

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=_F32))
    if not musts and not shoulds:
        return empty  # only must_not matches nothing (boolean_weight.rs)
    if any(c.postings is None for c in musts):
        return empty  # a required term absent from the segment

    # ---- candidate generation -------------------------------------------
    aligned: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    if musts:
        order = sorted(range(len(musts)), key=lambda i: musts[i].postings.doc_freq)
        docs0, tfs0, fns0 = musts[order[0]].postings.decode_all()
        candidates = docs0
        full0 = (docs0, tfs0, fns0)
        kept: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        kept[order[0]] = _align_full(*full0, candidates)
        for i in order[1:]:
            tf, fn, present = musts[i].postings.probe(candidates)
            keep = present
            candidates = candidates[keep]
            kept = {
                j: (t[keep], f[keep], p[keep]) for j, (t, f, p) in kept.items()
            }
            kept[i] = (tf[keep], fn[keep], np.ones(keep.sum(), dtype=bool))
        for j, triple in kept.items():
            aligned[id(musts[j])] = triple
        for c in shoulds:
            if c.postings is None:
                aligned[id(c)] = (
                    np.zeros(len(candidates), np.int64),
                    np.zeros(len(candidates), np.int64),
                    np.zeros(len(candidates), bool),
                )
            else:
                aligned[id(c)] = c.postings.probe(candidates)
    else:
        live = [c for c in shoulds if c.postings is not None]
        if not live:
            return empty
        ubs = np.array(
            [c.postings.max_block_score(c.weight) for c in live], dtype=_F32
        )
        # θ seed: the k-th true score of the highest-impact term lower-
        # bounds the final k-th score (doc totals can only be larger).
        # Only valid when no doc can be *removed* later: must_not
        # exclusion or a minimum_should_match bar could evict seed docs,
        # making θ an overestimate and the prune unsafe.
        theta = _F32(0.0)
        seed_full = None
        si = -1
        # const_score guard: BM25 block bounds say nothing about a
        # constant score, so every matching doc must stay a candidate
        if minimum_should_match <= 1 and not must_nots \
                and const_score is None:
            si = int(np.argmax(ubs))
            theta, seed_full = _seed_theta(live[si].postings,
                                           live[si].weight, k)
        # single-term fast path: the kept blocks ARE the candidates, so
        # decode them once (docs+tfs+fns), score, and return — the
        # general path would decode them a second time in the alignment
        # probe.  Scores/tie-breaks identical to the general path (same
        # f32 score call, same _topk_order).
        if len(live) == 1 and float(theta) > 0.0 and seed_full is None \
                and not isinstance(live[0].postings, ArrayPostings) \
                and live[0].postings.__dict__.get("_decoded") is None \
                and not live[0].postings.cache_decoded:
            c0 = live[0]
            p0 = c0.postings
            bms0 = p0.block_scores(c0.weight).astype(np.float64)
            need0 = np.flatnonzero(
                bms0 >= float(theta) - _wand_eps(float(theta), 0.0))
            if 0 < len(need0) < len(bms0):
                docs0, tfs0, _ = blocks.decode_postings(
                    p0.doc_enc, p0.tf_enc, p0.block_doc_off,
                    p0.block_tf_off, p0.block_last, p0.doc_freq, need0,
                )
                fns0 = blocks.fnorms_for_blocks(
                    p0.fnorm_enc, p0.doc_freq, need0)
                sc0 = np.zeros(len(docs0), dtype=_F32)
                sc0 = (sc0 + c0.weight.score(
                    fns0.astype(np.int64), tfs0)).astype(_F32)
                order0 = _topk_order(docs0, sc0, k)
                return docs0[order0], sc0[order0]
        asc = np.argsort(ubs, kind="stable")
        cum = np.cumsum(ubs[asc].astype(np.float64))
        non_essential = set()
        for rank, ci in enumerate(asc):
            if cum[rank] < float(theta):
                non_essential.add(int(ci))
            else:
                break
        # BlockWAND candidate cut per essential term: a doc found ONLY in
        # blocks with bms_t[b] + Σ_{t'≠t} ub_t' < θ scores below θ under
        # every term that contains it, so it cannot reach the top k (and
        # cannot tie: skipping is strict-below after the epsilon guard,
        # which also covers f32 accumulation rounding in the scorer).
        sum_ubs = float(np.sum(ubs.astype(np.float64)))
        parts = []
        fulls: dict[int, tuple] = {}
        if seed_full is not None:
            fulls[si] = seed_full  # the max-ub term is always essential
        for i, c in enumerate(live):
            if i in non_essential:
                continue
            if i in fulls:
                parts.append(fulls[i][0])
                continue
            others = sum_ubs - float(ubs[i])
            limit = float(theta) - others - _wand_eps(float(theta), others)
            docs_i, full = _candidate_cut(c.postings, c.weight, limit)
            parts.append(docs_i)
            if full is not None:
                fulls[i] = full
        candidates = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        for i, c in enumerate(live):
            if i in fulls:
                aligned[id(c)] = _align_full(*fulls[i], candidates)
            else:
                aligned[id(c)] = c.postings.probe(candidates)
        for c in shoulds:
            if c.postings is None:
                aligned[id(c)] = (
                    np.zeros(len(candidates), np.int64),
                    np.zeros(len(candidates), np.int64),
                    np.zeros(len(candidates), bool),
                )

    if len(candidates) == 0:
        return empty

    # ---- minimum_should_match -------------------------------------------
    if minimum_should_match > 0 and shoulds:
        match_count = np.zeros(len(candidates), dtype=np.int64)
        for c in shoulds:
            match_count += aligned[id(c)][2]
        keep = match_count >= minimum_should_match
        candidates = candidates[keep]
        aligned = {key: (t[keep], f[keep], p[keep]) for key, (t, f, p) in aligned.items()}

    # ---- must_not exclusion ----------------------------------------------
    for c in must_nots:
        if len(candidates) == 0:
            break
        _, _, present = c.postings.probe(candidates)
        keep = ~present
        candidates = candidates[keep]
        aligned = {key: (t[keep], f[keep], p[keep]) for key, (t, f, p) in aligned.items()}

    if len(candidates) == 0:
        return empty

    # ---- scoring: f32 accumulation in clause order ------------------------
    if const_score is not None:
        scores = np.full(len(candidates), _F32(const_score), dtype=_F32)
    else:
        scores = np.zeros(len(candidates), dtype=_F32)
        for c in clauses:
            if c.occur == "must_not" or id(c) not in aligned or c.weight is None:
                continue
            tf, fn, present = aligned[id(c)]
            sc = c.weight.score(fn, tf)
            sc = np.where(present, sc, _F32(0.0)).astype(_F32)
            scores = (scores + sc).astype(_F32)

    # ---- top-k with ascending-doc tie-break -------------------------------
    order = _topk_order(candidates, scores, k)
    return candidates[order], scores[order]


def _slop_count(left: np.ndarray, right: np.ndarray, slop: int) -> int:
    """Greedy slop-window match count over offset-adjusted position lists —
    the two-pointer walk of phrase_scorer.rs intersection_count_with_slop
    (:145-191): a pair matches when |l - r| <= slop; on a match, advance
    the left pointer past any better (larger, still <= r) candidate."""
    li = ri = count = 0
    ll, rl = len(left), len(right)
    while li < ll and ri < rl:
        lv, rv = int(left[li]), int(right[ri])
        if abs(lv - rv) <= slop:
            while li + 1 < ll and left[li + 1] <= rv:
                li += 1
            count += 1
            li += 1
            ri += 1
        elif lv < rv:
            li += 1
        else:
            ri += 1
    return count


def _carrying_slop_intersect(
    left: list[int],
    lslops: list[int],
    right: list[int],
    max_slop: int,
    update_left: bool,
) -> tuple[int, list[int], list[int]]:
    """Multi-term slop intersection carrying the slop budget spent so far —
    phrase_scorer.rs intersection_count_with_carrying_slop (:232-345).

    Slop is a budget spent on inter-term distances.  On a match both the
    smaller and larger positions are kept as candidate matches (which one
    is "best" depends on later terms), each annotated with the budget
    consumed; consecutive duplicates keep the cheaper slop (add_val,
    :253-264).  When either side exhausts, remaining positions of the
    other side within budget of the last value are appended (:311-335).
    Returns (match_count, new_left_positions, new_left_slops); the new
    lists are only meaningful when update_left is True.
    """
    if not left or not right:
        return 0, [], []
    new_pos: list[int] = []
    new_slops: list[int] = []

    def add_val(s: int, v: int) -> None:
        if update_left:
            if new_pos and new_pos[-1] == v:
                new_slops[-1] = min(new_slops[-1], s)
            else:
                new_pos.append(v)
                new_slops.append(s)

    li = ri = count = 0
    n_left, n_right = len(left), len(right)
    while True:
        lv = left[li]
        s_far = lslops[li] if li < len(lslops) else 0
        rv = right[ri]
        distance = s_far + abs(lv - rv)
        if distance <= max_slop:
            if lv < rv:
                smaller, larger, si, spos = lv, rv, li, left
            else:
                smaller, larger, si, spos = rv, lv, ri, right
            new_slop = distance
            add_val(new_slop, smaller)
            while si + 1 < len(spos):
                nxt = spos[si + 1]
                if nxt > larger:
                    break
                si += 1
                new_slop = s_far + abs(nxt - larger)
                add_val(new_slop, nxt)
            add_val(new_slop, larger)
            count += 1
            li += 1
            ri += 1
        elif lv < rv:
            li += 1
        else:
            ri += 1
        if li >= n_left or ri >= n_right:
            if li >= n_left:
                lv = left[-1]
                s_far = lslops[-1] if lslops else 0
                for rv2 in right[ri:]:
                    ns = abs(lv - rv2) + s_far
                    if ns <= max_slop:
                        add_val(ns, rv2)
            else:
                rv = right[-1]
                for idx in range(li, n_left):
                    lv2 = left[idx]
                    s_far = lslops[idx] if idx < len(lslops) else 0
                    ns = abs(lv2 - rv) + s_far
                    if ns <= max_slop:
                        add_val(ns, lv2)
            break
    return count, new_pos, new_slops


def _carrying_slop_count(adjusted: list[list[int]], slop: int) -> int:
    """Phrase-occurrence count for a 3+-term slop phrase over one doc's
    offset-adjusted position lists — the compute_phrase_match /
    compute_phrase_count dispatch of phrase_scorer.rs (:437-507):
    intermediate terms intersect with update_left=True carrying slops,
    the final term only counts."""
    left = adjusted[0]
    lslops: list[int] = []
    for t in range(1, len(adjusted) - 1):
        _, left, lslops = _carrying_slop_intersect(
            left, lslops, adjusted[t], slop, True
        )
        if not left:
            return 0
    count, _, _ = _carrying_slop_intersect(
        left, lslops, adjusted[-1], slop, False
    )
    return count


def phrase_match_arrays(
    term_postings: list,
    slop: int = 0,
    last_alternatives: list | None = None,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Evaluate a phrase over one segment -> (doc_ids, phrase_counts,
    fieldnorm_ids) for ALL matching docs — the PhraseScorer docset+
    phrase_count computation (phrase_scorer.rs:405-507) without the top-k.
    Feeds both the phrase top-k and the boolean kernel (phrase as a
    virtual-term ArrayPostings clause)."""
    empty3 = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    # normalize to slots-of-alternatives: each phrase position may accept a
    # set of posting lists (PhrasePrefix expansions; RegexPhrase per-slot
    # regex expansions, src/query/phrase_query/regex_phrase_query.rs)
    slots: list[list[TermPostings]] = []
    base = term_postings if last_alternatives is None else term_postings[:-1]
    for tp in base:
        if tp is None:
            return empty3
        slots.append(tp if isinstance(tp, list) else [tp])
    if last_alternatives is not None:
        slots.append([tp for tp in last_alternatives if tp is not None])
    for alt in slots:
        if not [tp for tp in alt if tp is not None]:
            return empty3
    slots = [[tp for tp in alt if tp is not None] for alt in slots]

    uniq: dict[int, tuple] = {}
    for alt in slots:
        for tp in alt:
            if id(tp) not in uniq:
                uniq[id(tp)] = tp.decode_all()

    cand = None
    for alt in slots:
        docs = (
            uniq[id(alt[0])][0]
            if len(alt) == 1
            else np.unique(np.concatenate([uniq[id(tp)][0] for tp in alt]))
        )
        cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
    if cand is None or len(cand) == 0:
        return empty3
    alive = _alive_mask(cand, dead)
    if alive is not None:
        # drop tombstoned docs BEFORE position decode (alive-bitset
        # applied at the docset, phrase_scorer feeds only live docs)
        cand = cand[alive]
        if len(cand) == 0:
            return empty3

    # positions per phrase slot, aligned to candidates
    pos_cache: dict[int, list[np.ndarray]] = {}

    def positions_of(tp: TermPostings) -> list[np.ndarray]:
        if id(tp) not in pos_cache:
            docs, tfs, _ = uniq[id(tp)]
            idx = np.searchsorted(docs, cand)
            present = (idx < len(docs))
            idx = np.clip(idx, 0, max(len(docs) - 1, 0))
            hit = present & (docs[idx] == cand)
            plists = [np.empty(0, dtype=np.int64)] * len(cand)
            if hit.any():
                got = tp.positions_for(idx[hit], tfs[idx[hit]])
                for slot, arr in zip(np.flatnonzero(hit), got):
                    plists[slot] = arr
            pos_cache[id(tp)] = plists
        return pos_cache[id(tp)]

    slot_positions = []
    for alt in slots:
        if len(alt) == 1:
            slot_positions.append(positions_of(alt[0]))
        else:
            alt_pos = [positions_of(tp) for tp in alt]
            slot_positions.append([
                np.unique(np.concatenate([ap[i] for ap in alt_pos]))
                for i in range(len(cand))
            ])

    # fieldnorm of each candidate: from whichever alternative of slot 0
    # contains it (every candidate is in at least one)
    fns = np.zeros(len(cand), dtype=np.int64)
    for tp in slots[0]:
        docs_a, _, fns_a = uniq[id(tp)]
        ia = np.searchsorted(docs_a, cand)
        ok = (ia < len(docs_a))
        ia = np.clip(ia, 0, max(len(docs_a) - 1, 0))
        hit = ok & (docs_a[ia] == cand)
        fns[hit] = fns_a[ia[hit]]

    counts = np.zeros(len(cand), dtype=np.int64)
    n_slots = len(slot_positions)
    for i in range(len(cand)):
        if slop > 0 and n_slots == 2:
            counts[i] = _slop_count(
                slot_positions[0][i].astype(np.int64),
                slot_positions[1][i].astype(np.int64) - 1,
                slop,
            )
            continue
        if slop > 0:
            # offset-adjust each slot by (n_slots-1 - t) so an exact match
            # has equal values (PostingsWithOffset, phrase_scorer.rs:379-384)
            adjusted = [
                (slot_positions[t][i].astype(np.int64) + (n_slots - 1 - t)).tolist()
                for t in range(n_slots)
            ]
            counts[i] = _carrying_slop_count(adjusted, slop)
            continue
        starts = slot_positions[0][i]
        for t in range(1, n_slots):
            if len(starts) == 0:
                break
            starts = starts[np.isin(starts + t, slot_positions[t][i], assume_unique=True)]
        counts[i] = len(starts)

    keep = counts > 0
    return cand[keep], counts[keep], fns[keep]


def segment_topk_phrase(
    term_postings: list[TermPostings | None],
    weight: Bm25Weight,
    k: int,
    slop: int = 0,
    last_alternatives: list[TermPostings] | None = None,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-phrase top-k for one segment.

    Semantics (src/query/phrase_query/phrase_scorer.rs): doc matches when
    the terms occur at consecutive positions; tf = number of phrase
    occurrences (phrase_count, :405-437); score = weight.score(fieldnorm,
    phrase_count) with the multi-term summed-idf weight (:578-582,
    bm25.rs:136-142).  Duplicate terms in the phrase share one posting
    list.  Candidates = conjunction of all term docsets, then a per-doc
    vectorized position-chain intersection.

    `slop` > 0 uses the reference's greedy slop-window count for 2-term
    phrases (phrase_scorer.rs:145-191) and the carrying-slop-budget
    intersection for 3+ terms (:232-345); `last_alternatives` replaces the
    final slot with a union of posting lists — the PhrasePrefix expansion
    (src/query/phrase_prefix_query/phrase_prefix_scorer.rs).
    """
    cand, counts, fns = phrase_match_arrays(
        term_postings, slop=slop, last_alternatives=last_alternatives,
        dead=dead,
    )
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=_F32)
    scores = weight.score(fns, counts)
    order = _topk_order(cand, scores, k)
    return cand[order], scores[order]


def segment_topk_dismax(
    subclauses: list[Clause], tie_breaker: float, k: int,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """DisjunctionMax over term subqueries: max + tie_breaker * (sum - max)
    (src/query/disjunction_max_query.rs:64-83, score_combiner.rs)."""
    live = [c for c in subclauses if c.postings is not None]
    if not live:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=_F32)
    ubs = np.array(
        [c.postings.max_block_score(c.weight) for c in live], dtype=_F32
    )
    # θ seed + BlockWAND cut (safe only with no deletes pending — dead
    # removal after candidate gen could evict seed docs and overstate θ).
    # A doc's dismax score via its best arm a* in block b is
    # <= bms_a*[b] + tie * Σ_{a≠a*} ub_a, so cutting every containing
    # block under its own arm's rule proves score < θ.
    theta = _F32(0.0)
    seed_full = None
    si = -1
    if dead is None:
        si = int(np.argmax(ubs))
        theta, seed_full = _seed_theta(live[si].postings, live[si].weight, k)
    sum_ubs = float(np.sum(ubs.astype(np.float64)))
    tie = float(tie_breaker)
    parts = []
    fulls: dict[int, tuple] = {}
    if seed_full is not None:
        fulls[si] = seed_full
    for i, (c, ub) in enumerate(zip(live, ubs)):
        if i in fulls:
            parts.append(fulls[i][0])
            continue
        others = tie * (sum_ubs - float(ub))
        limit = float(theta) - others - _wand_eps(float(theta), others)
        docs_i, full = _candidate_cut(c.postings, c.weight, limit)
        parts.append(docs_i)
        if full is not None:
            fulls[i] = full
    candidates = np.unique(np.concatenate(parts))
    alive = _alive_mask(candidates, dead)
    if alive is not None:
        candidates = candidates[alive]  # per-doc scores are independent
    if len(candidates) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=_F32)
    mx = np.zeros(len(candidates), dtype=_F32)
    sm = np.zeros(len(candidates), dtype=_F32)
    for i, c in enumerate(live):
        if i in fulls:
            tf, fn, present = _align_full(*fulls[i], candidates)
        else:
            tf, fn, present = c.postings.probe(candidates)
        sc = np.where(present, c.weight.score(fn, tf), _F32(0.0)).astype(_F32)
        mx = np.maximum(mx, sc)
        sm = (sm + sc).astype(_F32)
    scores = (mx + _F32(tie_breaker) * (sm - mx)).astype(_F32)
    order = _topk_order(candidates, scores, k)
    return candidates[order], scores[order]
