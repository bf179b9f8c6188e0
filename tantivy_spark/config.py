"""Index configuration — the analogue of tantivy's Schema + IndexSettings.

The reference declares a strict schema with per-field tokenizer/record
options and BM25 params (/root/reference/src/schema/, index_meta.rs:240-260).
We index a single text field of a typed DataFrame; the schema role is played
by the source table's StructType plus this config.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    #: column holding the text to index
    text_col: str = "text"
    #: stable document identity; docs are ordered by these columns within a
    #: segment (the reference's index-sorting invariant: stable ordering by
    #: (conv_id, turn_idx), src/index/index_meta.rs:288-398)
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    #: first key col is hashed to place a doc in a segment; all turns of a
    #: conversation land in one segment
    segment_col: str = "conv_id"
    #: analyzer name in tantivy_spark.functions.analysis.ANALYZERS
    tokenizer: str = "default"
    #: number of build segments. Scale note: one segment ≈ one stage-1 task;
    #: at 10^12 turns pick n_segments so a segment holds ~1-5M docs (doc ids
    #: are dense int32 per segment, like tantivy's per-segment u32 DocId).
    n_segments: int = 8
    #: directory-level partition buckets of the postings table; exact-term
    #: queries prune to |terms| buckets. 8 is right for tests; use 256+ at
    #: 100 TB so a bucket is a few GB.
    n_term_buckets: int = 8
    #: store token positions (needed for phrase queries)
    positions: bool = False
    #: IndexRecordOption (src/schema/index_record_option.rs:15-27):
    #: "freqs" (default, WithFreqs) records term frequencies; "basic"
    #: records docs only — every posting scores with tf=1 (the tf-1
    #: delta stream bitpacks to zero width, so no tf bytes are paid),
    #: matching the reference's Basic semantics.  Positions require
    #: freqs (WithFreqsAndPositions), like the reference.
    record: str = "freqs"
    #: DateOptions precision (src/schema/date_time_options.rs
    #: DateTimePrecision): truncate every timestamp fast-field column in
    #: the docmap to "seconds" | "milliseconds" | "microseconds".
    #: None keeps source precision (parquet micros).  Truncation happens
    #: at index time, so range bounds compare against truncated values —
    #: the reference's fast-field truncation semantics.
    date_precision: str | None = None
    #: additional indexed text columns (tantivy's multi-field schema,
    #: ARCHITECTURE.md:103-116).  Terms of field f are stored scoped as
    #: "f:token" with f's OWN per-doc fieldnorm and per-field token totals
    #: in the manifest, so scoped-term BM25 uses the field's avgdl exactly
    #: like the reference's per-field statistics (bm25.rs:33-51).
    extra_fields: tuple[str, ...] = ()
    #: stage-2 dataflow — all three produce byte-identical posting rows:
    #: "segment" (default): one task per segment with direct pyarrow file
    #:   IO (tantivy's per-thread SegmentWriter shape) — zero shuffles,
    #:   zero JVM<->Python IPC, lineage collected in-pass; needs the index
    #:   dir reachable from executors (local fs / NFS / object store).
    #: "local": the same per-segment dataflow through Catalyst
    #:   groupBy + applyInArrow — for storage pyarrow can't reach.
    #: "salted": shuffle partial-aggregated (term, doc) rows by
    #:   (segment, term-shard) — finer tasks, the fallback when segments
    #:   are too large for one task.
    #: Segment count must give enough tasks to fill the cluster, and one
    #: segment's docmap batch must fit a task (size via n_segments;
    #: ~1-2M docs/segment at production scale).
    postings_mode: str = "segment"
    #: index sorting (IndexSettings::sort_by_field, src/index/
    #: index_meta.rs:288-398): (field, "asc"|"desc") orders docs within
    #: each segment by that fast-field value, enabling early termination
    #: for top-k-by-that-field scans.  None (default) keeps the stable
    #: key_cols order.  key_cols remain the tiebreak either way, so the
    #: assignment stays deterministic.
    sort_by_field: tuple[str, str] | None = None
    #: tokenize stage dataflow: True (default) uses the hot-path engine
    #: below whenever tokenizer="default"; False forces the
    #: vectorized-pandas path (the parity oracle).  Non-default
    #: tokenizers always use the pandas path.
    jvm_tokenize: bool = True
    #: hot-path engine when jvm_tokenize applies: "arrow" (default) runs
    #: the vectorized numpy kernel over raw Arrow buffers in a mapInArrow
    #: stage (functions/arrow_tokenize.py — ~12x the per-core throughput
    #: of either regex engine, parity pinned by tests/test_arrow_tokenize;
    #: handles single/multi field, with and without positions); "jvm"
    #: keeps the pure-Catalyst regexp path (zero Python workers —
    #: single/multi field, no positions; positions fall back to pandas).
    tokenize_engine: str = "arrow"
    #: how documents are assigned to segments:
    #: "auto" (default): resolve to "input" whenever the config allows the
    #:   fused shuffle-free pass (postings_mode="segment",
    #:   tokenizer="default", jvm_tokenize=True, tokenize_engine="arrow"
    #:   — the defaults), else "hash".  jvm_tokenize=False forces the
    #:   vectorized-pandas analyzer, which the fused arrow-kernel pass
    #:   cannot honor, so auto falls back to "hash" there.  The resolved
    #:   mode is what the manifest records.
    #:   Rationale: "input" is the measured at-scale dataflow (BENCH.md:
    #:   ~0.87-0.99 scaling efficiency, ~170 MB/s at 32 cores vs "hash"'s
    #:   0.43 / ~16 MB/s through its raw-text exchange+sort) — the default
    #:   build a user gets must be the one that meets the scaling bar.
    #: "hash": segment = pmod(xxhash64(segment_col), n_segments).
    #:   Content-deterministic — the same doc lands in the same segment no
    #:   matter how the input is partitioned — at the cost of ONE raw-text
    #:   exchange + within-partition sort (the only shuffle of the build).
    #: "input": one segment per INPUT partition — the reference's actual
    #:   IndexWriter semantics (index_writer.rs worker threads fill
    #:   segments in arrival order; doc ids are ingestion order, not
    #:   content-hashed).  ZERO shuffles: one fused mapInArrow pass per
    #:   input split tokenizes, writes the docmap, encodes the postings
    #:   and writes the term-dictionary slice (build.build_fused_input).
    #:   Segment layout is deterministic given the same input partitioning
    #:   (for parquet scans, pin spark.sql.files.maxPartitionBytes /
    #:   minPartitionNum; a repartition()ed or persisted frame is already
    #:   fixed) and is by construction independent of executor count —
    #:   the 100-TB shape: n_segments/segment_col are ignored, segment
    #:   size is bounded by the split size instead of corpus/n_segments.
    #:   Requires postings_mode="segment", tokenizer="default",
    #:   tokenize_engine="arrow".  Query results are identical to "hash"
    #:   builds (scores use global manifest stats; only the physical
    #:   layout differs).
    segment_assignment: str = "auto"

    def resolved_segment_assignment(self) -> str:
        """Resolve "auto" to the mode this config will actually build
        with; "hash"/"input" pass through."""
        if self.segment_assignment != "auto":
            return self.segment_assignment
        fused_ok = (self.postings_mode == "segment"
                    and self.tokenizer == "default"
                    and self.jvm_tokenize
                    and self.tokenize_engine == "arrow")
        return "input" if fused_ok else "hash"
    k1: float = 1.2
    b: float = 0.75
    #: per-field BM25 overrides, ((field, k1, b), ...) — the reference's
    #: per-field Bm25Params (src/index/index_meta.rs:240-260: each text
    #: field option carries its own k1/b).  Fields not listed use the
    #: index-level k1/b above.  Applies to `extra_fields` entries (their
    #: terms are scoped `field:token`); the main text field can be
    #: overridden under the reserved name "" (empty string).
    field_bm25: tuple[tuple[str, float, float], ...] = ()

    def bm25_params_for_field(self, field: str | None) -> tuple[float, float]:
        """(k1, b) for `field` (None/"" = the main text field)."""
        key = field or ""
        for f, k1, b in self.field_bm25:
            if f == key:
                return float(k1), float(b)
        return self.k1, self.b

    def to_json(self) -> str:
        d = asdict(self)
        d["key_cols"] = list(self.key_cols)
        d["extra_fields"] = list(self.extra_fields)
        d["field_bm25"] = [list(t) for t in self.field_bm25]
        if self.sort_by_field is not None:
            d["sort_by_field"] = list(self.sort_by_field)
        return json.dumps(d)

    @staticmethod
    def from_json(s: str) -> "IndexConfig":
        d = json.loads(s)
        d["key_cols"] = tuple(d["key_cols"])
        d["extra_fields"] = tuple(d.get("extra_fields", ()))
        d["field_bm25"] = tuple(
            tuple(t) for t in d.get("field_bm25", ()))
        if d.get("sort_by_field") is not None:
            d["sort_by_field"] = tuple(d["sort_by_field"])
        return IndexConfig(**d)
