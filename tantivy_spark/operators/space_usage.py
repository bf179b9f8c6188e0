"""Space usage reporting — the reference's `space_usage` module.

Mirrors `SearcherSpaceUsage` / `SegmentSpaceUsage`
(src/space_usage/mod.rs:61-207): per-segment byte counts for each index
component, totaled across the index.  The reference sums its per-file
component writers; here each component is a set of parquet files, and
the per-column compressed sizes inside the postings files give the same
component split the reference gets from separate files:

* postings   — `doc_enc`/`tf_enc` + block skip metadata (posting lists)
* positions  — `pos_enc`/`pos_off` (the reference's `.pos` files)
* fieldnorms — `fnorm_enc` plus the docmap's `fieldnorm_id` column
* termdict   — the materialized `terms/` table + the postings `term`
  column (the reference's `.term` FST files)
* store      — docmap source/passthrough columns (the reference's
  row-oriented docstore)
* fast_fields— typed docmap columns used by range/agg/sort paths
* deletes    — tombstones parquet bytes

Byte counts are compressed on-disk sizes (ByteCount semantics).
"""

from __future__ import annotations

import glob
import os

_POSTINGS_COLS = ("doc_enc", "tf_enc", "doc_freq", "sum_tf", "max_tf",
                  "block_last", "block_doc_off", "block_tf_off",
                  "bm_norm_id", "bm_tf", "segment_ord")
_POSITIONS_COLS = ("pos_enc", "pos_off")
_FNORM_COLS = ("fnorm_enc",)
_TERM_COLS = ("term",)
#: docmap columns that are index machinery rather than stored fields
_DOCMAP_META = {"doc_id", "terms", "token_count", "positions",
                "fieldnorm_id", "term_fns"}


def _column_sizes(path_glob: str) -> dict[str, int]:
    """Compressed byte size per top-level column across parquet files."""
    import pyarrow.parquet as pq

    sizes: dict[str, int] = {}
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                top = col.path_in_schema.split(".", 1)[0]
                sizes[top] = sizes.get(top, 0) + col.total_compressed_size
    return sizes


def _bucket(sizes: dict[str, int], cols) -> int:
    return int(sum(v for k, v in sizes.items() if k in cols))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def segment_space_usage(index_dir: str, segment_ord: int,
                        manifest_entry: dict) -> dict:
    """SegmentSpaceUsage (mod.rs:101-207) for one segment."""
    seg = segment_ord
    post = _column_sizes(
        os.path.join(index_dir, "postings", "tbucket=*", f"seg{seg}.parquet"))
    terms = _column_sizes(
        os.path.join(index_dir, "terms", "tbucket=*", f"seg{seg}.parquet"))
    docmap = _column_sizes(
        os.path.join(index_dir, "docmap", f"segment_ord={seg}", "*.parquet"))
    fast_fields = {k: v for k, v in docmap.items()
                   if k not in _DOCMAP_META}
    usage = {
        "segment_ord": seg,
        "num_docs": int(manifest_entry.get("n_docs", 0)),
        "postings": _bucket(post, _POSTINGS_COLS),
        "positions": _bucket(post, _POSITIONS_COLS),
        "fieldnorms": (_bucket(post, _FNORM_COLS)
                       + docmap.get("fieldnorm_id", 0)
                       + docmap.get("term_fns", 0)),
        "termdict": _bucket(post, _TERM_COLS) + sum(terms.values()),
        "store": (docmap.get("terms", 0) + docmap.get("token_count", 0)
                  + docmap.get("doc_id", 0) + docmap.get("positions", 0)),
        "fast_fields": int(sum(fast_fields.values())),
        "per_fast_field": {k: int(v) for k, v in sorted(fast_fields.items())},
    }
    usage["total"] = (usage["postings"] + usage["positions"]
                      + usage["fieldnorms"] + usage["termdict"]
                      + usage["store"] + usage["fast_fields"])
    return usage


def searcher_space_usage(index_dir: str, manifest: dict) -> dict:
    """SearcherSpaceUsage (mod.rs:61-99): per-segment usages + totals.
    `deletes` is index-level here (tombstones are a shared table keyed
    by segment, like the reference's per-segment `.del` files)."""
    segments = [
        segment_space_usage(index_dir, s["segment_ord"], s)
        for s in manifest.get("segments", [])
    ]
    deletes = _dir_bytes(os.path.join(index_dir, "tombstones"))
    usage = {
        "segments": segments,
        "deletes": int(deletes),
        "total": int(sum(s["total"] for s in segments) + deletes),
    }
    for comp in ("postings", "positions", "fieldnorms", "termdict",
                 "store", "fast_fields"):
        usage[comp] = int(sum(s[comp] for s in segments))
    return usage
