"""Annotate objdump disassembly of a stemmer region in dict_snowball.so.

Behavioral-study companion to tools/extract_amongs.py: renders the
generated Snowball C routines readable by resolving RIP-relative data
references (among tables -> their suffix inventories, .rodata strings ->
decoded UTF-8, grouping bitmaps -> member characters) and naming local
call targets.  Used to reconstruct the published Turkish/Tamil stemmer
control flow exactly (same black box ts_lexize queries; this just reads
the official build instead of probing it one word at a time).

Usage: python tools/annotate_stemmer_asm.py 0x5d940 0x5fa40 > tr.asm
"""
from __future__ import annotations

import re
import struct
import subprocess
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"

sys.path.insert(0, "/root/repo/tools")
from extract_amongs import load, table_starts  # noqa: E402


def decode_str(data, v2f, vaddr, maxlen=60):
    f = v2f(vaddr)
    if f is None:
        return None
    raw = data[f: f + maxlen]
    # snowball literals are length-prefixed at the CALL site, not NUL
    # terminated; just show a slice
    try:
        s = raw.split(b"\x00")[0][:40].decode("utf-8")
        if s:
            return s
    except UnicodeDecodeError:
        pass
    return raw[:16].hex()


def grouping_bits(data, v2f, vaddr, nbytes=24):
    """Decode a snowball grouping bitmap (bit k = char (min+k) in set)."""
    f = v2f(vaddr)
    if f is None:
        return None
    return data[f: f + nbytes].hex()


def main(start, stop):
    data, v2f, relocs = load()

    starts = table_starts(relocs)
    # among tables: base vaddr -> suffix list
    bases = {}
    offs = sorted(relocs)
    runs = []
    cur = []
    prev = None
    for o in offs:
        base = o - 8
        fb = v2f(base)
        if fb is None:
            continue
        s_size = struct.unpack_from("<i", data, fb)[0]
        sf = v2f(relocs[o])
        if not (0 < s_size <= 40) or sf is None:
            if cur:
                runs.append(cur)
            cur = []
            prev = None
            continue
        if base in starts or (prev is not None and base - prev != 32):
            runs.append(cur)
            cur = []
        raw = data[sf: sf + s_size]
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.hex()
        cur.append((base, text))
        prev = base
    if cur:
        runs.append(cur)
    for run in runs:
        for i, (b, _t) in enumerate(run):
            bases[b] = (run[0][0], i, [t for _, t in run])

    dis = subprocess.run(
        ["objdump", "-d", f"--start-address={start:#x}",
         f"--stop-address={stop:#x}", SO],
        capture_output=True, text=True).stdout

    # local function starts = call targets inside [start, stop)
    local_targets = set()
    for m in re.finditer(r"\tcall\s+([0-9a-f]+) ", dis):
        t = int(m.group(1), 16)
        if start <= t < stop:
            local_targets.add(t)
    local_targets.add(start)

    out = []
    last_imm = {}  # reg -> last immediate moved into it
    pending = None  # (vaddr of last lea data target)
    for line in dis.splitlines():
        m = re.match(r"\s+([0-9a-f]+):", line)
        if m and int(m.group(1), 16) in local_targets:
            out.append(f"\n======== LOCAL FN fn_{m.group(1)} ========")
        im = re.search(r"mov\s+\$0x([0-9a-f]+),%(esi|edx|ecx|r8d)", line)
        if im:
            last_imm[im.group(2)] = int(im.group(1), 16)
        # annotate rip-relative comments
        cm = re.search(r"#\s+([0-9a-f]+)(?:\s|<|$)", line)
        ann = ""
        if cm:
            tgt = int(cm.group(1), 16)
            if tgt in bases:
                b0, i, suf = bases[tgt]
                show = " ".join(suf[:40])
                ann = f"   ;; AMONG@{b0:#x}[{i}] n={len(suf)}: {show}"
            elif tgt >= 0x60000:  # data
                pending = tgt
                s = decode_str(data, v2f, tgt)
                if s:
                    ann = f"   ;; DATA {s!r}"
        # exact literal for eq_s_b/eq_s/slice_from_s (size in esi) and
        # insert_s (size in ecx): truncate the last lea'd string
        callm = re.search(r"call\s+\w+ <(eq_s_b|eq_s|slice_from_s|"
                          r"insert_s|replace_s)@plt>", line)
        if callm and pending is not None:
            fn = callm.group(1)
            size = last_imm.get("ecx" if fn == "insert_s" else "esi")
            if size and 0 < size <= 60:
                f = v2f(pending)
                if f is not None:
                    raw = data[f: f + size]
                    try:
                        lit = raw.decode("utf-8")
                    except UnicodeDecodeError:
                        lit = raw.hex()
                    ann = f"   ;; {fn} LIT({size}) = {lit!r}"
        # rename local call targets
        line = re.sub(
            r"call\s+([0-9a-f]+) <[^>]+>",
            lambda m: (f"call   fn_{m.group(1)}"
                       if int(m.group(1), 16) in local_targets
                       else m.group(0)),
            line)
        out.append(line + ann)
    print("\n".join(out))


if __name__ == "__main__":
    main(int(sys.argv[1], 0), int(sys.argv[2], 0))
