"""Vectorized default-analyzer tokenization over raw Arrow UTF-8 buffers.

The default chain (SimpleTokenizer -> RemoveLong(40 bytes, pre-lowercase)
-> per-char LowerCaser without the final-sigma rule; reference
src/tokenizer/{tokenizer.rs,remove_long.rs,lower_caser.rs}) costs
~26-30 MB/s/core through any regex engine (java.util.regex and RE2 both,
measured on the bench corpus) — the per-char class test dominates.  This
kernel replaces the regex with pure numpy passes over the Arrow string
buffers:

  * byte-level class membership via a 0x110000-entry LUT (CPython
    ``str.isalnum``, which is bit-identical to the ``[^\\W_]`` class the
    pandas parity oracle uses — verified across the codepoint space),
    continuation bytes inheriting their lead byte's membership through a
    gather on a running last-lead index;
  * token runs from boolean transitions, with forced breaks at document
    boundaries so tokens never span rows;
  * RemoveLong as a run filter BEFORE lowercasing (byte length, like the
    reference);
  * lowercase: one 256-entry LUT pass for ASCII A-Z over the whole
    compressed token buffer (safe: UTF-8 lead/continuation bytes never
    collide with 0x41-0x5A), plus ``pyarrow.compute.utf8_lower`` for the
    minority of tokens carrying non-ASCII bytes.  utf8proc's per-char
    simple lowercase IS the no-final-sigma contract (probed over every
    codepoint); the single divergence, U+0130 'İ' (CPython emits
    'i'+U+0307, utf8proc plain 'i'), is patched by a substring replace
    before the lower.

Throughput: ~200-400 MB/s/core (~10x the regex engines) on the bench
transcript corpus.  Parity with the pandas analyzer is pinned by
tests/test_arrow_tokenize.py (codepoint sweep + structured fuzz + the
corpus itself).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import DEFAULT_LONG_LIMIT

_CLASS_LUT: np.ndarray | None = None
_ASCII_LOWER = np.arange(256, dtype=np.uint8)
_ASCII_LOWER[ord("A"):ord("Z") + 1] += 32


def _class_lut() -> np.ndarray:
    """Codepoint -> token-class membership (CPython isalnum), built once
    per process (~0.2 s) and cached."""
    global _CLASS_LUT
    if _CLASS_LUT is None:
        lut = np.zeros(0x110000, dtype=bool)
        members = [
            c for c in range(0x110000)
            if not (0xD800 <= c <= 0xDFFF) and chr(c).isalnum()
        ]
        lut[np.asarray(members, dtype=np.int64)] = True
        _CLASS_LUT = lut
    return _CLASS_LUT


def _utf8_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, per-row byte offsets rebased to 0) for a string array."""
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    buffers = arr.buffers()
    off = np.frombuffer(
        buffers[1], dtype=off_dtype, count=len(arr) + 1,
        offset=arr.offset * np.dtype(off_dtype).itemsize,
    ).astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    return np.ascontiguousarray(data[lo:hi]), off - lo


def tokenize_default_arrow(
    arr: pa.Array, positions: bool = False,
) -> pa.ListArray | tuple[pa.ListArray, pa.ListArray]:
    """Default-analyzer tokens for a string array -> list<string>.

    Output row i is the exact token list the pandas oracle
    (`analysis._tokenize_default_terms`) produces for row i; null -> [].
    With ``positions=True`` also returns list<int32> of pre-filter token
    ordinals (RemoveLong leaves gaps — remove_long.rs:28-37), matching
    `analysis.tokenize_default`'s second output.
    """
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if arr.null_count:
        # null slots may carry arbitrary offset extents per the Arrow
        # spec; rebuild with genuinely empty values
        arr = pc.fill_null(arr, "")
    b, doc_off = _utf8_bytes(arr)
    n = b.shape[0]
    n_docs = len(arr)
    zero_off = pa.array(np.zeros(n_docs + 1, dtype=np.int32))
    empty = pa.ListArray.from_arrays(zero_off, pa.array([], type=pa.string()))
    empty_pos = pa.ListArray.from_arrays(zero_off, pa.array([], type=pa.int32()))
    if n == 0:
        return (empty, empty_pos) if positions else empty

    # ---- per-byte class membership ------------------------------------
    lut = _class_lut()
    member = lut[:256][b]                      # correct for ASCII bytes
    leads = np.flatnonzero(b >= 0xC0)          # non-ASCII char starts
    if leads.size:
        # decode codepoints only AT the lead positions (small gathers)
        lb = b[leads].astype(np.uint32)
        pad = np.zeros(3, dtype=np.uint8)
        bx = np.concatenate([b, pad]) if leads[-1] + 3 >= n else b
        g1 = bx[leads + 1].astype(np.uint32) & 0x3F
        g2 = bx[leads + 2].astype(np.uint32) & 0x3F
        g3 = bx[leads + 3].astype(np.uint32) & 0x3F
        cp = np.where(
            lb < 0xE0, ((lb & 0x1F) << 6) | g1,
            np.where(
                lb < 0xF0, ((lb & 0x0F) << 12) | (g1 << 6) | g2,
                ((lb & 0x07) << 18) | (g1 << 12) | (g2 << 6) | g3,
            ),
        )
        m = lut[np.minimum(cp.astype(np.int64), 0x10FFFF)]
        member[leads] = m
        # continuation bytes inherit the lead's membership (scatter by
        # char length instead of an O(n) running-index accumulate)
        s2 = np.minimum(leads + 1, n - 1)
        member[s2] = m
        l3 = leads[lb >= 0xE0]
        if l3.size:
            member[np.minimum(l3 + 2, n - 1)] = member[l3]
        l4 = leads[lb >= 0xF0]
        if l4.size:
            member[np.minimum(l4 + 3, n - 1)] = member[l4]

    # ---- token runs, broken at document boundaries --------------------
    prev = np.empty(n, dtype=bool)
    prev[0] = False
    prev[1:] = member[:-1]
    nxt = np.empty(n, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = member[1:]
    inner = doc_off[(doc_off > 0) & (doc_off < n)]
    if inner.size:
        prev[inner] = False                    # a doc start never continues
        nxt[inner - 1] = False                 # a doc end never continues
    starts = np.flatnonzero(member & ~prev)
    ends = np.flatnonzero(member & ~nxt)
    lengths = ends - starts + 1

    pos = None
    if positions:
        # pre-filter token ordinal within its doc (RemoveLong leaves gaps)
        off_all = np.searchsorted(starts, doc_off)
        doc_of_tok = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(off_all))
        pos = (np.arange(starts.shape[0], dtype=np.int64)
               - off_all[doc_of_tok]).astype(np.int32)

    # ---- RemoveLong (bytes, before lowercasing) -----------------------
    long_idx = np.flatnonzero(lengths >= DEFAULT_LONG_LIMIT)
    if long_idx.size:
        for t in long_idx:                     # rare: zero the dropped runs
            member[starts[t]:ends[t] + 1] = False
        keep = np.ones(lengths.shape[0], dtype=bool)
        keep[long_idx] = False
        starts, ends, lengths = starts[keep], ends[keep], lengths[keep]
        if positions:
            pos = pos[keep]
    n_tok = lengths.shape[0]
    if n_tok == 0:
        return (empty, empty_pos) if positions else empty

    # tokens per doc -> list offsets
    list_off = np.searchsorted(starts, doc_off).astype(np.int32)

    # ---- compress token bytes out of the doc buffer --------------------
    vals = _ASCII_LOWER[b[member]]             # ASCII lowercase in the same pass
    tok_off = np.zeros(n_tok + 1, dtype=np.int32)
    np.cumsum(lengths, out=tok_off[1:])

    flat = pa.StringArray.from_buffers(
        n_tok,
        pa.py_buffer(tok_off.tobytes()),
        pa.py_buffer(vals.tobytes()),
    )

    # ---- non-ASCII lowercase (utf8proc == per-char no-final-sigma) ----
    # a token carries non-ASCII iff a lead byte falls inside its range —
    # locate those tokens from `leads` (no full-buffer reduceat)
    if leads.size:
        tok_leads = leads[member[leads]]       # leads inside kept tokens
        if tok_leads.size:
            # map byte position -> token ordinal; dropped-long-token leads
            # resolve to the PREVIOUS kept token's range and are filtered
            # by the containment check
            t_idx = np.searchsorted(starts, tok_leads, side="right") - 1
            inside = (t_idx >= 0) & (tok_leads <= ends[np.maximum(t_idx, 0)])
            idx_na = np.unique(t_idx[inside])
        else:
            idx_na = np.empty(0, dtype=np.int64)
        if idx_na.size:
            sub = flat.take(pa.array(idx_na))
            sub = pc.replace_substring(sub, pattern="İ", replacement="i̇")
            sub_low = pc.utf8_lower(sub)
            sub_b, sub_off = _utf8_bytes(sub_low)
            sub_lens = np.diff(sub_off)
            na_starts = tok_off[:-1][idx_na].astype(np.int64)
            if bool(np.array_equal(sub_lens, lengths[idx_na])):
                # common case: lowercase preserved every byte length —
                # scatter the lowered bytes back in place
                nb = np.repeat(na_starts, sub_lens) \
                    + (np.arange(int(sub_off[-1]), dtype=np.int64)
                       - np.repeat(sub_off[:-1], sub_lens))
                vals[nb] = sub_b
                flat = pa.StringArray.from_buffers(
                    n_tok,
                    pa.py_buffer(tok_off.tobytes()),
                    pa.py_buffer(vals.tobytes()),
                )
            else:
                # rare: some token changed byte length (e.g. İ, Ⱥ) —
                # rebuild the flat buffer with shifted offsets
                new_lengths = lengths.astype(np.int64).copy()
                new_lengths[idx_na] = sub_lens
                out_off = np.zeros(n_tok + 1, dtype=np.int64)
                np.cumsum(new_lengths, out=out_off[1:])
                src_start = tok_off[:-1].astype(np.int64).copy()
                src_start[idx_na] = sub_off[:-1]
                tok_of_byte = np.repeat(
                    np.arange(n_tok, dtype=np.int64), new_lengths)
                src_idx = (src_start[tok_of_byte]
                           + np.arange(int(out_off[-1]), dtype=np.int64)
                           - out_off[tok_of_byte])
                na_sel = np.zeros(n_tok, dtype=bool)
                na_sel[idx_na] = True
                na_byte = na_sel[tok_of_byte]
                out_vals = np.empty(int(out_off[-1]), dtype=np.uint8)
                out_vals[~na_byte] = vals[src_idx[~na_byte]]
                out_vals[na_byte] = sub_b[src_idx[na_byte]]
                flat = pa.StringArray.from_buffers(
                    n_tok,
                    pa.py_buffer(out_off.astype(np.int32).tobytes()),
                    pa.py_buffer(out_vals.tobytes()),
                )

    toks = pa.ListArray.from_arrays(pa.array(list_off), flat)
    if positions:
        return toks, pa.ListArray.from_arrays(
            pa.array(list_off), pa.array(pos, type=pa.int32()))
    return toks


def concat_list_rows(arrs: list[pa.ListArray]) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise concatenation plan for same-length list arrays.

    Returns (combined list offsets int32[n+1], perm int64[total]) where
    ``perm[dest] = src`` indexes into the source arrays' flat children
    concatenated in order — one `take(perm)` materializes row-major
    [arr0_row_i ++ arr1_row_i ++ ...] without any per-row Python.
    """
    n = len(arrs[0])
    offs = [np.asarray(a.offsets, dtype=np.int64) for a in arrs]
    counts = [np.diff(o) for o in offs]
    total_row = np.sum(counts, axis=0)
    comb_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total_row, out=comb_off[1:])
    total = int(comb_off[-1])
    perm = np.empty(total, dtype=np.int64)
    base = 0
    prior = np.zeros(n, dtype=np.int64)
    for s in range(len(arrs)):
        ns = int(offs[s][-1] - offs[s][0])
        if ns:
            row_of = np.repeat(np.arange(n, dtype=np.int64), counts[s])
            dest = (comb_off[:-1] + prior)[row_of] \
                + (np.arange(ns, dtype=np.int64)
                   - (offs[s][:-1] - offs[s][0])[row_of])
            perm[dest] = np.arange(ns, dtype=np.int64) + base
        base += ns
        prior += counts[s]
    return comb_off.astype(np.int32), perm
