"""BM25 scoring — float32, operation-order-faithful to tantivy.

Reference: /root/reference/src/query/bm25.rs.

* ``idf(n, N) = ln(1 + (N - n + 0.5) / (n + 0.5))``  (bm25.rs:66-70)
* ``weight = idf * (1 + k1)``                        (bm25.rs:178,193);
  multi-term weights sum the per-term idfs first      (bm25.rs:136-142)
* per-fieldnorm-id norm cache:
  ``k1 * (1 - b + b * decoded_norm / avgdl)``        (bm25.rs:72-83)
* ``score(norm_id, tf) = weight * tf / (tf + cache[norm_id])``
                                                     (bm25.rs:204-217)
* ``avgdl = total_num_tokens / total_num_docs`` from EXACT token totals
  (bm25.rs:122-124); the per-doc dl is the QUANTIZED decoded norm.
* All arithmetic is f32 (``type Score = f32``) — we use numpy float32 with
  the same expression shape so scores are reproduced to the ulp (validated
  against the reference's golden fixtures in tests/test_bm25.py).

Defaults k1=1.2, b=0.75 (src/index/index_meta.rs:246).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tantivy_spark.functions.fieldnorm import FIELD_NORMS_TABLE, MAX_FIELDNORM

_F32 = np.float32


@dataclass(frozen=True)
class Bm25Params:
    """k1/b with the reference's validation (src/index/index_meta.rs:240-260)."""

    k1: float = 1.2
    b: float = 0.75

    def __post_init__(self) -> None:
        if not self.k1 >= 0.0:
            raise ValueError("k1 must be non-negative")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError("b must be in [0, 1]")


def idf(doc_freq, doc_count) -> np.float32 | np.ndarray:
    """f32 idf, same op order as bm25.rs:66-70. Accepts scalars or arrays."""
    doc_freq = np.asarray(doc_freq, dtype=np.int64)
    doc_count = np.asarray(doc_count, dtype=np.int64)
    if np.any(doc_count < doc_freq):
        raise ValueError("doc_count must be >= doc_freq")
    x = ((doc_count - doc_freq).astype(_F32) + _F32(0.5)) / (
        doc_freq.astype(_F32) + _F32(0.5)
    )
    out = np.log(_F32(1.0) + x, dtype=_F32)
    return out if out.ndim else _F32(out)


class Bm25Weight:
    """Per-(query-term-set) scoring weight with the 256-entry norm cache.

    Mirrors Bm25Weight (bm25.rs:85-217). Global statistics (doc_freq, N,
    total tokens) are supplied by the caller — the reference explicitly
    blesses external corpus-wide stats via Bm25StatisticsProvider
    (bm25.rs:9-31), which is what makes cross-partition rank-identical
    scoring well-defined in a distributed build.
    """

    __slots__ = ("weight", "cache", "average_fieldnorm", "params")

    def __init__(self, idf_value: np.float32, average_fieldnorm: np.float32,
                 params: Bm25Params) -> None:
        self.params = params
        self.average_fieldnorm = _F32(average_fieldnorm)
        self.weight = _F32(_F32(idf_value) * (_F32(1.0) + _F32(params.k1)))
        # cache[id] = k1 * (1 - b + b * decoded_norm / avgdl)  (bm25.rs:72-83)
        k1 = _F32(params.k1)
        b = _F32(params.b)
        norms = FIELD_NORMS_TABLE.astype(_F32)
        self.cache = k1 * (_F32(1.0) - b + b * norms / self.average_fieldnorm)
        self.cache = self.cache.astype(_F32)

    # -- constructors -----------------------------------------------------
    @classmethod
    def for_one_term(cls, term_doc_freq: int, total_num_docs: int,
                     avg_fieldnorm: float, params: Bm25Params = Bm25Params()) -> "Bm25Weight":
        return cls(idf(term_doc_freq, total_num_docs), _F32(avg_fieldnorm), params)

    @classmethod
    def for_terms(cls, doc_freqs: list[int], total_num_docs: int,
                  total_num_tokens: int, params: Bm25Params = Bm25Params()) -> "Bm25Weight":
        """Multi-term (e.g. phrase) weight: idfs summed first (bm25.rs:136-142).
        avgdl from exact token totals (bm25.rs:122-124)."""
        avg = _F32(_F32(total_num_tokens) / _F32(total_num_docs))
        if len(doc_freqs) == 1:
            return cls(idf(doc_freqs[0], total_num_docs), avg, params)
        idf_sum = _F32(0.0)
        for df_ in doc_freqs:
            idf_sum = _F32(idf_sum + idf(df_, total_num_docs))
        return cls(idf_sum, avg, params)

    # -- scoring ----------------------------------------------------------
    def boost_by(self, boost: float) -> "Bm25Weight":
        if boost == 1.0:
            return self
        clone = Bm25Weight.__new__(Bm25Weight)
        clone.params = self.params
        clone.average_fieldnorm = self.average_fieldnorm
        clone.cache = self.cache
        clone.weight = _F32(self.weight * _F32(boost))
        return clone

    def tf_factor(self, fieldnorm_id, term_freq) -> np.ndarray:
        tf = np.asarray(term_freq, dtype=_F32)
        norm = self.cache[np.asarray(fieldnorm_id, dtype=np.int64)]
        return (tf / (tf + norm)).astype(_F32)

    def score(self, fieldnorm_id, term_freq) -> np.ndarray:
        """Vectorized: weight * tf / (tf + cache[norm_id]) in f32."""
        return (_F32(self.weight) * self.tf_factor(fieldnorm_id, term_freq)).astype(_F32)

    def max_score(self) -> np.float32:
        """score(255, MAX_FIELDNORM) — bm25.rs:208-210."""
        return _F32(self.score(np.array([255]), np.array([MAX_FIELDNORM]))[0])
