"""Index build — the distributed analogue of tantivy's write path.

tantivy: IndexWriter worker threads each build an independent immutable
segment (dense per-segment doc ids, in-arena term -> postings buffers),
then serialize sorted postings in 128-doc blocks and atomically commit a
meta.json (/root/reference/src/indexer/index_writer.rs,
segment_writer.rs:221-330, postings/serializer.rs:314-497,
segment_updater.rs:511).

Spark-first mapping (NOT a port — see SURVEY.md §3.1):

  stage 1 ``docmap``   tokenize once (vectorized Arrow UDF), assign each doc
                       a dense per-segment doc_id by the stable
                       (conv_id, turn_idx) order, quantize fieldnorms.
                       Written partitioned by segment_ord — the per-segment
                       "segment files" and the tokenize checkpoint.
  stage 2 ``postings`` explode terms -> partial-aggregated (term, doc) tf
                       counts -> shuffle by (segment_ord, term-shard) ->
                       block-encode per term with numpy -> term-bucket
                       partitioned parquet, sorted by term within files
                       (parquet min/max stats play tantivy's term-dict FST
                       role; the tbucket dir plays term partition pruning).
  stage 3 ``manifest`` per-segment lineage/metrics + global stats + config,
                       written LAST — the atomic-meta.json commit protocol
                       (ARCHITECTURE.md:53).

Skew strategy (north-rule requirement): the shuffle key is
(segment_ord, term_shard). A Zipf-hot term's postings are bounded per
reducer by the *segment* size, because a segment contributes at most one
posting per doc — segments are the salt, sized by ``n_segments``.  At
10^12 turns: n_segments ≈ corpus/2M docs, n_term_buckets 256+, and AQE
handles residual imbalance.

Resumability: each stage writes its table idempotently (overwrite) and then
drops a ``_done_<stage>`` marker; ``build_index(resume=True)`` skips stages
whose marker exists.  The manifest (with per-segment lineage: docs
tokenized, tokens, postings emitted, terms) commits last.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy_spark.config import IndexConfig
from tantivy_spark.functions import analysis
from tantivy_spark.functions.fieldnorm import fieldnorm_to_id
from tantivy_spark.operators import blocks

MANIFEST_NAME = "manifest.json"
TERMS_DIR = "terms"

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("segment_ord", T.IntegerType()),
        T.StructField("doc_freq", T.LongType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("doc_enc", T.BinaryType()),
        T.StructField("tf_enc", T.BinaryType()),
        T.StructField("fnorm_enc", T.BinaryType()),
        T.StructField("block_last", T.ArrayType(T.LongType())),
        T.StructField("block_doc_off", T.ArrayType(T.IntegerType())),
        T.StructField("block_tf_off", T.ArrayType(T.IntegerType())),
        T.StructField("bm_norm_id", T.ArrayType(T.IntegerType())),
        T.StructField("bm_tf", T.ArrayType(T.IntegerType())),
        T.StructField("pos_enc", T.BinaryType(), nullable=True),
        T.StructField("pos_off", T.ArrayType(T.IntegerType()), nullable=True),
        T.StructField("tbucket", T.IntegerType()),
    ]
)


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side term -> partition bucket; must equal the Spark-side
    crc32-based expression used at write time (java.util.zip.CRC32 == zlib)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _term_bucket_col(term_col, n_buckets: int):
    return F.pmod(F.crc32(term_col.cast("binary")), F.lit(n_buckets)).cast("int")


def _marker(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, f"_done_{stage}")


def _stage_done(index_dir: str, stage: str) -> bool:
    return os.path.exists(_marker(index_dir, stage))


def _mark_done(index_dir: str, stage: str) -> None:
    os.makedirs(index_dir, exist_ok=True)
    with open(_marker(index_dir, stage), "w") as f:
        f.write(str(time.time()))


# --------------------------------------------------------------------------
# stage 1: docmap (tokenize + dense per-segment doc ids + fieldnorms)
# --------------------------------------------------------------------------

def build_docmap(spark: SparkSession, source: DataFrame, cfg: IndexConfig,
                 fixed_segment_ord: int | None = None) -> DataFrame:
    """Tokenized corpus with stable per-segment dense doc ids.

    Doc identity: tantivy assigns dense u32 doc ids in insertion order per
    segment (ARCHITECTURE.md:68-72); we assign them by the deterministic
    stable sort on key_cols within a deterministic hash-assigned segment, so
    two builds (at any parallelism) produce identical ids.

    `fixed_segment_ord` pins every doc to one segment — the incremental
    path (one segment per streaming micro-batch / commit, the reference's
    add_document -> commit -> new segment lifecycle).
    """
    tokenizer = cfg.tokenizer
    positions = cfg.positions
    extra_fields = tuple(cfg.extra_fields)

    tok_schema = "terms array<string>"
    if positions:
        tok_schema += ", positions array<int>"
    tok_schema += ", token_count int, fieldnorm_id int"
    if extra_fields:
        # per-token fieldnorm (each scoped term carries ITS field's norm —
        # the reference records one fieldnorm byte per doc per field,
        # fieldnorm/writer.rs:58-95) + per-field scalar stats
        tok_schema += ", term_fns array<int>"
        for f in extra_fields:
            tok_schema += f", xf_tc_{f} int, xf_fn_{f} int"

    text_col = cfg.text_col

    def tokenize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf[text_col]
            if tokenizer == "pretokenized":
                # PreTokStr (src/schema/field_type.rs PreTokenizedString,
                # src/tokenizer/tokenized_string.rs): the source column is
                # array<string> of ready tokens; the analyzer is bypassed
                # and positions are sequential token ordinals
                terms = texts.map(
                    lambda t: [str(x) for x in t] if t is not None else [])
                if positions:
                    poss = terms.map(lambda ts: list(range(len(ts))))
            elif positions:
                terms, poss = analysis.analyze_series_with_positions(texts, tokenizer)
            else:
                terms = analysis.analyze_series(texts, tokenizer)
            counts = terms.map(len).to_numpy(np.int64)
            fn_ids = fieldnorm_to_id(counts)
            out = pdf.drop(columns=[text_col])
            if extra_fields:
                # extra fields are plain strings even when the main field
                # is pretokenized — analyze them with the default chain
                xf_tok = "default" if tokenizer == "pretokenized" else tokenizer
                xf_terms, xf_poss, xf_counts, xf_fns = {}, {}, {}, {}
                for f in extra_fields:
                    col = pdf[f].astype("string").fillna("")
                    if positions:
                        ts, ps = analysis.analyze_series_with_positions(col, xf_tok)
                        xf_poss[f] = ps
                    else:
                        ts = analysis.analyze_series(col, xf_tok)
                    xf_terms[f] = ts
                    xf_counts[f] = ts.map(len).to_numpy(np.int64)
                    xf_fns[f] = np.asarray(fieldnorm_to_id(xf_counts[f]), np.int64)
                combined_terms, combined_pos, combined_fns = [], [], []
                for i in range(len(pdf)):
                    row_terms = list(terms.iloc[i])
                    row_fns = [int(fn_ids[i])] * len(row_terms)
                    row_pos = list(poss.iloc[i]) if positions else None
                    for f in extra_fields:
                        ftoks = [f"{f}:{t}" for t in xf_terms[f].iloc[i]]
                        row_terms.extend(ftoks)
                        row_fns.extend([int(xf_fns[f][i])] * len(ftoks))
                        if positions:
                            row_pos.extend(xf_poss[f].iloc[i])
                    combined_terms.append(row_terms)
                    combined_fns.append(row_fns)
                    if positions:
                        combined_pos.append(row_pos)
                out["terms"] = pd.Series(combined_terms, index=pdf.index)
                if positions:
                    out["positions"] = pd.Series(combined_pos, index=pdf.index)
                out["token_count"] = counts
                out["fieldnorm_id"] = np.asarray(fn_ids, dtype=np.int32)
                out["term_fns"] = pd.Series(combined_fns, index=pdf.index)
                for f in extra_fields:
                    out[f"xf_tc_{f}"] = xf_counts[f].astype(np.int32)
                    out[f"xf_fn_{f}"] = xf_fns[f].astype(np.int32)
            else:
                out["terms"] = terms
                if positions:
                    out["positions"] = poss
                out["token_count"] = counts
                out["fieldnorm_id"] = np.asarray(fn_ids, dtype=np.int32)
            yield out

    if fixed_segment_ord is not None:
        seg = F.lit(int(fixed_segment_ord)).cast("int")
    else:
        seg = F.pmod(F.xxhash64(F.col(cfg.segment_col)), F.lit(cfg.n_segments)).cast("int")
    # keep ALL non-text source columns: the docmap doubles as the fast-field
    # column store (parquet is already columnar+bitpacked — the reference's
    # .fast file role, ARCHITECTURE.md:161-166)
    base = source.withColumn("segment_ord", seg)

    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.schema.fields
        if f.name != text_col
    )
    out_schema = f"{passthrough}, {tok_schema}"

    tokenized = base.mapInPandas(tokenize_batches, schema=out_schema)

    # index sorting (index_meta.rs:288-398): optional fast-field order
    # first, key_cols as the deterministic tiebreak
    order = [F.col(c) for c in cfg.key_cols]
    if cfg.sort_by_field is not None:
        fld, direction = cfg.sort_by_field
        lead = F.col(fld).desc() if direction == "desc" else F.col(fld).asc()
        order = [lead] + order
    w = Window.partitionBy("segment_ord").orderBy(*order)
    return tokenized.withColumn("doc_id", (F.row_number().over(w) - 1).cast("int"))


# --------------------------------------------------------------------------
# stage 2: postings (explode -> tf agg -> block encode, skew-sharded)
# --------------------------------------------------------------------------

def _encode_runs(seg: int, term_of_run: np.ndarray, uniq_terms,
                 doc_of_run: np.ndarray, tfs_all: np.ndarray,
                 fn_of_run: np.ndarray, pos_flat: np.ndarray | None,
                 n_term_buckets: int, positions: bool) -> pd.DataFrame:
    """Encode term-sorted (term, doc) runs into posting rows — the shared
    core of both encode paths (token-stream and pre-aggregated).

    `term_of_run` must be rank-coded and sorted (runs grouped per term,
    docs ascending within a term); `pos_flat` holds each run's positions
    consecutively in run order (lengths = tfs_all).  Positions encode is
    ONE cross-term vectorized pass (blocks.encode_positions_flat); rows
    are assembled column-wise (no per-row dicts)."""
    import zlib

    term_boundary = np.flatnonzero(
        np.diff(term_of_run, prepend=term_of_run[0] - 1)
    )
    term_ends = np.append(term_boundary[1:], len(term_of_run))
    if positions:
        pos_all_enc, pos_all_off = blocks.encode_positions_flat(
            pos_flat, tfs_all
        )

    n_terms = len(term_boundary)
    c_term: list[str] = []
    c_doc_freq = np.empty(n_terms, dtype=np.int64)
    c_sum_tf = np.empty(n_terms, dtype=np.int64)
    c_max_tf = np.empty(n_terms, dtype=np.int64)
    c_doc_enc: list[bytes] = []
    c_tf_enc: list[bytes] = []
    c_fn_enc: list[bytes] = []
    c_bl: list[list] = []
    c_bdo: list[list] = []
    c_bto: list[list] = []
    c_bmn: list[list] = []
    c_bmt: list[list] = []
    c_pe: list[bytes | None] = []
    c_po: list[list | None] = []
    c_tb = np.empty(n_terms, dtype=np.int64)

    for ti, (lo, hi) in enumerate(zip(term_boundary, term_ends)):
        term = str(uniq_terms[term_of_run[lo]])
        tfs = tfs_all[lo:hi]
        e = blocks.encode_postings(
            doc_of_run[lo:hi], tfs, fn_of_run[lo:hi].astype(np.uint8)
        )
        c_term.append(term)
        c_doc_freq[ti] = e["doc_freq"]
        c_sum_tf[ti] = tfs.sum()
        c_max_tf[ti] = tfs.max()
        c_doc_enc.append(e["doc_enc"])
        c_tf_enc.append(e["tf_enc"])
        c_fn_enc.append(e["fnorm_enc"])
        c_bl.append(e["block_last"].tolist())
        c_bdo.append(e["block_doc_off"].tolist())
        c_bto.append(e["block_tf_off"].tolist())
        c_bmn.append(e["bm_norm_id"].tolist())
        c_bmt.append(e["bm_tf"].tolist())
        if positions:
            bstart = int(pos_all_off[lo])
            bend = (
                int(pos_all_off[hi]) if hi < len(pos_all_off)
                else len(pos_all_enc)
            )
            c_pe.append(pos_all_enc[bstart:bend])
            c_po.append((pos_all_off[lo:hi] - bstart).astype(np.int32).tolist())
        else:
            c_pe.append(None)
            c_po.append(None)
        c_tb[ti] = zlib.crc32(term.encode("utf-8")) % n_term_buckets

    return pd.DataFrame(
        {
            "term": c_term,
            "segment_ord": np.full(n_terms, seg, dtype=np.int64),
            "doc_freq": c_doc_freq,
            "sum_tf": c_sum_tf,
            "max_tf": c_max_tf,
            "doc_enc": c_doc_enc,
            "tf_enc": c_tf_enc,
            "fnorm_enc": c_fn_enc,
            "block_last": c_bl,
            "block_doc_off": c_bdo,
            "block_tf_off": c_bto,
            "bm_norm_id": c_bmn,
            "bm_tf": c_bmt,
            "pos_enc": c_pe,
            "pos_off": c_po,
            "tbucket": c_tb,
        },
        columns=[f.name for f in POSTINGS_SCHEMA.fields],
    )


def _encode_group(pdf: pd.DataFrame, n_term_buckets: int,
                  positions: bool = False) -> pd.DataFrame:
    """Block-encode every term of one (segment_ord, shard) group.

    Input rows: (segment_ord, term, doc_id, fieldnorm_id, tf[, positions])
    — already one row per (term, doc) run (Catalyst did the partial agg),
    so this rank-codes terms, lexsorts (term, doc), and hands the runs to
    the shared vectorized encoder.  No pandas groupby / per-term dict rows
    (the round-1 shape) — the only remaining Python loop is the per-term
    block encode itself."""
    seg = int(pdf["segment_ord"].iloc[0])
    codes, uniq = pd.factorize(pdf["term"], sort=True)
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    order = np.lexsort((doc_ids, codes))
    c_s = codes[order]
    d_s = doc_ids[order]
    tfs = pdf["tf"].to_numpy(np.int64)[order]
    fns = pdf["fieldnorm_id"].to_numpy(np.int64)[order]
    pos_flat = None
    if positions:
        pos_series = pdf["positions"].to_numpy(dtype=object)[order]
        pos_flat = (
            np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_series])
            if len(pos_series)
            else np.empty(0, dtype=np.int64)
        )
    return _encode_runs(seg, c_s, uniq, d_s, tfs, fns, pos_flat,
                        n_term_buckets, positions)


def _encode_segment(pdf: pd.DataFrame, n_term_buckets: int,
                    positions: bool) -> pd.DataFrame:
    """Encode ALL postings of one segment in one vectorized pass.

    This is the segment-local posting construction of the reference
    (SegmentWriter + PostingsSerializer, segment_writer.rs:221-330,
    postings_writer.rs:49-120) as a numpy kernel: flatten the token
    stream, factorize terms, lexsort (term, doc), run-length-encode the
    (term, doc) runs into tfs, then block-encode each term's list.
    """
    pdf = pdf.sort_values("doc_id", kind="stable")
    seg = int(pdf["segment_ord"].iloc[0])
    counts = pdf["terms"].map(len).to_numpy(np.int64)
    if counts.sum() == 0:
        return pd.DataFrame([], columns=[f.name for f in POSTINGS_SCHEMA.fields])
    tokens = np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"]])
    doc_rep = np.repeat(pdf["doc_id"].to_numpy(np.int64), counts)
    if "term_fns" in pdf.columns:
        # multi-field: each token carries its own field's fieldnorm
        fn_rep = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in pdf["term_fns"]]
        )
    else:
        fn_rep = np.repeat(pdf["fieldnorm_id"].to_numpy(np.int64), counts)
    if positions:
        pos_flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
        )
    codes, uniq_terms = pd.factorize(pd.Series(tokens), sort=True)
    return _encode_token_stream(
        seg, codes, uniq_terms, doc_rep, fn_rep,
        pos_flat if positions else None, n_term_buckets, positions,
    )


def _encode_segment_arrow(table, n_term_buckets: int,
                          positions: bool, multi_field: bool):
    """Arrow-native variant of `_encode_segment`: the token stream never
    materializes as Python objects — list-flatten, doc-sort, and
    dictionary-encode all run in Arrow C++ (combine_chunks / take /
    flatten / dictionary_encode), then the same numpy run-length + block
    encoding.  This is the build's hot loop; object-dtype pandas was the
    memory-bandwidth bottleneck at high parallelism."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if table.num_rows == 0:
        return pa.table([], schema=_postings_arrow_schema())
    # doc order within the segment (shuffle delivers rows unordered)
    table = table.combine_chunks()
    table = table.take(pc.sort_indices(table.column("doc_id")))
    seg = int(table.column("segment_ord")[0].as_py())

    terms_col = table.column("terms").combine_chunks()
    offsets = terms_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    total = int(counts.sum())
    if total == 0:
        return pa.table([], schema=_postings_arrow_schema())
    flat = terms_col.flatten()

    denc = flat.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = denc.dictionary
    # rank-code so ascending code == lexicographic term order (the
    # factorize(sort=True) contract of the pandas path)
    sort_perm = pc.array_sort_indices(dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(sort_perm), dtype=np.int64)
    rank[sort_perm] = np.arange(len(sort_perm))
    codes = rank[idx]
    uniq_terms = dictionary.take(pa.array(sort_perm)).to_pylist()

    doc_rep = np.repeat(
        table.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
        counts,
    )
    if multi_field:
        fn_rep = table.column("term_fns").combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        fn_rep = np.repeat(
            table.column("fieldnorm_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            counts,
        )
    pos_flat = None
    if positions:
        pos_flat = table.column("positions").combine_chunks().flatten(
        ).to_numpy(zero_copy_only=False).astype(np.int64)

    pdf = _encode_token_stream(
        seg, codes, uniq_terms, doc_rep, fn_rep, pos_flat,
        n_term_buckets, positions,
    )
    return pa.Table.from_pandas(
        pdf, schema=_postings_arrow_schema(), preserve_index=False
    )


def _postings_arrow_schema():
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(POSTINGS_SCHEMA)


def _encode_token_stream(seg, codes, uniq_terms, doc_rep, fn_rep, pos_flat,
                         n_term_buckets, positions) -> pd.DataFrame:
    """Run-length + block encoding of one segment's rank-coded token
    stream (shared by the pandas and Arrow paths).  `codes` must be
    rank-coded: ascending code == lexicographic term order."""
    order = np.lexsort((doc_rep, codes))  # stable: positions stay in doc order
    c_s, d_s, f_s = codes[order], doc_rep[order], fn_rep[order]
    if positions:
        p_s = pos_flat[order]

    # run boundaries of equal (term, doc) -> tf per posting
    new_run = np.empty(len(c_s), dtype=bool)
    new_run[0] = True
    np.not_equal(c_s[1:], c_s[:-1], out=new_run[1:])
    new_run[1:] |= d_s[1:] != d_s[:-1]
    run_starts = np.flatnonzero(new_run)
    tfs_all = np.diff(np.append(run_starts, len(c_s)))
    term_of_run = c_s[run_starts]
    doc_of_run = d_s[run_starts]
    fn_of_run = f_s[run_starts]

    # per-(term, doc) runs in term-sorted order: each run's positions are
    # the p_s slice starting at its run_start (lengths = tfs) — exactly
    # the _encode_runs contract; positions encode happens there in ONE
    # cross-term vectorized pass
    pos_flat = p_s if positions else None
    return _encode_runs(seg, term_of_run, uniq_terms, doc_of_run, tfs_all,
                        fn_of_run, pos_flat, n_term_buckets, positions)


def build_postings_local(docmap: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Segment-local posting construction (the default, tantivy's shape).

    One task per segment builds that segment's complete postings in RAM
    (the reference's per-thread SegmentWriter arena), so the only shuffles
    are (a) docmap rows grouped to their segment (~docs, not tokens) and
    (b) the already-COMPRESSED posting rows moved into term-bucket layout.
    Shuffling compressed blocks instead of the raw token stream is what
    keeps the term shuffle ~20-50x smaller at 100 TB; hot terms are
    naturally salted because each segment emits at most one row per term.

    Memory bound: one segment's docmap batch must fit the task (size
    segments via cfg.n_segments; ~1-2M docs/segment at production scale).
    """
    nb = cfg.n_term_buckets
    with_pos = cfg.positions
    multi = bool(cfg.extra_fields)
    cols = ["segment_ord", "doc_id", "fieldnorm_id", "terms"]
    if with_pos:
        cols.append("positions")
    if multi:
        cols.append("term_fns")
    return (
        docmap.select(*cols)
        .groupBy("segment_ord")
        .applyInArrow(
            lambda table: _encode_segment_arrow(table, nb, with_pos, multi),
            schema=POSTINGS_SCHEMA,
        )
    )


def build_postings(docmap: DataFrame, cfg: IndexConfig, n_shards: int | None = None) -> DataFrame:
    """Flat (term, doc, tf) aggregation + per-term block encoding — the
    shuffle-by-term variant (kept for segments too large for one task; the
    default build uses build_postings_local).

    The groupBy below does map-side partial aggregation (Catalyst), so the
    shuffle carries one row per distinct (segment, term, doc) — not one row
    per token occurrence.
    """
    if n_shards is None:
        n_shards = max(cfg.n_segments * 4, 32)

    multi = bool(cfg.extra_fields)
    if cfg.positions:
        # zip terms with their analyzer positions (and, multi-field, each
        # token's own fieldnorm); shuffle carries one row per distinct
        # (segment, term, doc) with the position list attached
        zipped = ["terms", "positions"] + (["term_fns"] if multi else [])
        flat = (
            docmap.select(
                "segment_ord",
                "doc_id",
                "fieldnorm_id",
                F.explode(F.arrays_zip(*zipped)).alias("tp"),
            )
            .select(
                "segment_ord", "doc_id",
                (F.col("tp.term_fns") if multi else F.col("fieldnorm_id"))
                .alias("fieldnorm_id"),
                F.col("tp.terms").alias("term"),
                F.col("tp.positions").alias("pos"),
            )
            .groupBy("segment_ord", "term", "doc_id", "fieldnorm_id")
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
        )
    elif multi:
        flat = (
            docmap.select(
                "segment_ord",
                "doc_id",
                F.explode(F.arrays_zip("terms", "term_fns")).alias("tp"),
            )
            .select(
                "segment_ord", "doc_id",
                F.col("tp.term_fns").alias("fieldnorm_id"),
                F.col("tp.terms").alias("term"),
            )
            .groupBy("segment_ord", "term", "doc_id", "fieldnorm_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        flat = (
            docmap.select(
                "segment_ord",
                "doc_id",
                "fieldnorm_id",
                F.explode("terms").alias("term"),
            )
            .groupBy("segment_ord", "term", "doc_id", "fieldnorm_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    sharded = flat.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("term")), F.lit(n_shards)).cast("int")
    )
    nb = cfg.n_term_buckets
    with_pos = cfg.positions
    return (
        sharded.groupBy("segment_ord", "shard")
        .applyInPandas(
            lambda pdf: _encode_group(pdf, nb, with_pos), schema=POSTINGS_SCHEMA
        )
    )


# --------------------------------------------------------------------------
# stage 2.5: term dictionary (the FST analogue, materialized)
# --------------------------------------------------------------------------

def write_terms(spark: SparkSession, postings_df: DataFrame, terms_path: str,
                mode: str = "overwrite",
                segment_ords: list[int] | None = None) -> None:
    """Materialize the term dictionary table — the persisted analogue of
    tantivy's FST term dict (src/termdict/fst_termdict/, ARCHITECTURE.md
    .term file role).

    One row per (term, segment): the postings table minus its heavy
    encoded-block columns, plus a `tlen` length column.  fuzzy/regex/
    prefix expansion walks THIS table (length/prefix pruned, pushed to
    parquet stats) instead of aggregating the full postings table per
    query — the automaton ∩ term-dict walk of fuzzy_query.rs:80-106 /
    regex_query.rs:57.  Size: tens of bytes per (term, segment) vs KBs
    of blocks, so even an unpruned dictionary scan is ~100-1000x less IO
    than the postings table; exact lookups still prune by tbucket dir +
    term row-group stats.  Per-segment rows keep the table append-only
    under merges/streaming commits (live-segment visibility stays
    manifest-driven, like every other index table).
    """
    terms = postings_df
    if segment_ords is not None:
        terms = terms.filter(F.col("segment_ord").isin(list(segment_ords)))
    terms = terms.select(
        "term", "segment_ord", "doc_freq", "sum_tf", "tbucket",
        F.length("term").alias("tlen"),
    )
    (
        terms.repartition("tbucket")
        .sortWithinPartitions("tbucket", "term", "segment_ord")
        .write.mode(mode)
        .partitionBy("tbucket")
        .parquet(terms_path)
    )


# --------------------------------------------------------------------------
# full build with checkpoint/resume + manifest
# --------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    plugins: dict[str, "Callable[[DataFrame], DataFrame]"] | None = None,
) -> dict:
    """Build (or resume) the full index at ``index_dir``. Returns manifest.

    `plugins` is the SegmentPlugin extension surface (src/index/
    segment_component.rs:31-33, src/plugin.rs): each named callable maps
    the tokenized docmap frame to an extra table, written per segment
    under ``plugin_<name>/`` in the index directory and listed in the
    manifest; `Searcher.plugin(name)` reads it back.  Plugin frames must
    keep the ``segment_ord`` column (the per-segment-component contract)."""
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    docmap_path = os.path.join(index_dir, "docmap")
    postings_path = os.path.join(index_dir, "postings")

    t0 = time.time()
    stage_times: dict[str, float] = {}

    if not (resume and _stage_done(index_dir, "docmap")):
        t = time.time()
        docmap = build_docmap(spark, source, cfg)
        # the window already shuffled by segment_ord (into
        # spark.sql.shuffle.partitions tasks); write directly from that
        # partitioning — re-repartitioning to exactly n_segments would be a
        # balls-in-bins hash with straggler partitions holding 2+ segments
        (
            docmap.sortWithinPartitions("segment_ord", "doc_id")
            .write.mode("overwrite")
            .partitionBy("segment_ord")
            .parquet(docmap_path)
        )
        _mark_done(index_dir, "docmap")
        stage_times["docmap"] = time.time() - t

    docmap_df = spark.read.parquet(docmap_path)

    if not (resume and _stage_done(index_dir, "postings")):
        t = time.time()
        # Salted-term-shuffle encode (the default): fine-grained
        # (segment, term-shard) tasks keep every core busy and bound any
        # hot term's postings by the segment size (segments are the salt).
        # The segment-local variant (build_postings_local) encodes whole
        # segments in one task each (no per-token shuffle — least memory
        # traffic); pick it via cfg.postings_mode="local" when segment
        # count >> cores (it also serves the incremental streaming path).
        if cfg.postings_mode == "local":
            postings = build_postings_local(docmap_df, cfg)
        else:
            postings = build_postings(docmap_df, cfg)
        # hash-partition the write on (tbucket, term) — NOT
        # repartitionByRange, whose sampling pass would re-run the whole
        # encode pipeline.  Files stay term-sorted within each task, so
        # parquet row-group term stats still prune exact-term scans.
        n_write = max(cfg.n_term_buckets, spark.sparkContext.defaultParallelism)
        (
            postings.repartition(n_write, "tbucket", "term")
            .sortWithinPartitions("tbucket", "term", "segment_ord")
            .write.mode("overwrite")
            .partitionBy("tbucket")
            .parquet(postings_path)
        )
        _mark_done(index_dir, "postings")
        stage_times["postings"] = time.time() - t

    postings_df = spark.read.parquet(postings_path)

    # stage 2.5: term dictionary (near-free byproduct of the postings table)
    if not (resume and _stage_done(index_dir, "terms")):
        t = time.time()
        write_terms(spark, postings_df, os.path.join(index_dir, TERMS_DIR))
        _mark_done(index_dir, "terms")
        stage_times["terms"] = time.time() - t

    # stage 2.6: segment plugins (extra per-segment components)
    for pname, pfn in sorted((plugins or {}).items()):
        if resume and _stage_done(index_dir, f"plugin_{pname}"):
            continue
        t = time.time()
        out = pfn(docmap_df)
        if "segment_ord" not in out.columns:
            raise ValueError(
                f"plugin {pname!r} must keep the segment_ord column")
        (
            out.write.mode("overwrite")
            .partitionBy("segment_ord")
            .parquet(os.path.join(index_dir, f"plugin_{pname}"))
        )
        _mark_done(index_dir, f"plugin_{pname}")
        stage_times[f"plugin_{pname}"] = time.time() - t

    # stage 3: stats + per-segment lineage, manifest committed LAST
    t = time.time()
    xf_aggs = [
        F.sum(f"xf_tc_{f}").alias(f"xf_tokens_{f}") for f in cfg.extra_fields
    ]
    seg_doc_stats = {
        int(r["segment_ord"]): r
        for r in docmap_df.groupBy("segment_ord")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("n_tokens"),
            *xf_aggs,
        )
        .collect()
    }
    seg_post_stats = {
        int(r["segment_ord"]): r
        for r in postings_df.groupBy("segment_ord")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("doc_freq").alias("n_postings"),
        )
        .collect()
    }
    segments = []
    for seg_ord in sorted(seg_doc_stats):
        d = seg_doc_stats[seg_ord]
        p = seg_post_stats.get(seg_ord)
        seg_entry = {
            "segment_ord": seg_ord,
            "n_docs": int(d["n_docs"]),
            "n_tokens": int(d["n_tokens"]),
            "n_terms": int(p["n_terms"]) if p else 0,
            "n_postings": int(p["n_postings"]) if p else 0,
        }
        if cfg.extra_fields:
            seg_entry["field_tokens"] = {
                f: int(d[f"xf_tokens_{f}"] or 0) for f in cfg.extra_fields
            }
        segments.append(seg_entry)
    stage_times["stats"] = time.time() - t

    manifest = {
        "format_version": 1,
        "terms_table": True,
        "config": json.loads(cfg.to_json()),
        "total_docs": int(sum(s["n_docs"] for s in segments)),
        "total_tokens": int(sum(s["n_tokens"] for s in segments)),
        "segments": segments,
        "stage_seconds": stage_times,
        "build_seconds": time.time() - t0,
    }
    if plugins:
        manifest["plugins"] = sorted(plugins)
    if cfg.extra_fields:
        # per-field exact token totals — the reference's per-field
        # total_num_tokens feeding per-field avgdl (bm25.rs:33-51,
        # inverted_index_reader.rs:73-74)
        manifest["field_tokens"] = {
            f: int(sum(s["field_tokens"][f] for s in segments))
            for f in cfg.extra_fields
        }
    tmp = os.path.join(index_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))  # atomic commit
    return manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)
