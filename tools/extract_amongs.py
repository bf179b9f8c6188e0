"""Extract Snowball `among` tables from PostgreSQL's dict_snowball.so.

The generated Snowball C code compiles each among into an array of
32-byte structs { s_size; symbol *s; substring_i; result; function* }.
In the PIC .so, the string (struct+8) and optional condition-routine
(struct+24) pointers carry R_X86_64_RELATIVE relocations whose addends
are the target vaddrs — so walking the relocation table recovers every
among: exact suffix strings (with byte-precise boundaries), branch
result numbers, and which entries carry a condition routine.

This is BEHAVIORAL study of the official stemmers (the same black box
tools/probe_snowball.py queries through ts_lexize), used to pin the
suffix inventories our from-spec implementations must reproduce.

Usage: python tools/extract_amongs.py | less   (prints all amongs)
"""
from __future__ import annotations

import struct
import subprocess
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"


def load():
    data = open(SO, "rb").read()
    # section map: vaddr -> file offset (from readelf -S)
    sects = []
    out = subprocess.run(["readelf", "-SW", SO], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        parts = line.split()
        if "]" in line and len(parts) > 6:
            try:
                i = parts.index("PROGBITS")
                vaddr = int(parts[i + 1], 16)
                off = int(parts[i + 2], 16)
                size = int(parts[i + 3], 16)
                sects.append((vaddr, off, size))
            except (ValueError, IndexError):
                continue
    def v2f(v):
        for vaddr, off, size in sects:
            if vaddr <= v < vaddr + size:
                return off + (v - vaddr)
        return None

    relocs = {}
    out = subprocess.run(["readelf", "-r", SO], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 4 and parts[2] == "R_X86_64_RELATIVE":
            relocs[int(parts[0], 16)] = int(parts[3], 16)
    return data, v2f, relocs


def table_starts(relocs):
    """Exact among-table base addresses: every `find_among(z, a_K, N)`
    call site loads a_K with a RIP-relative lea — collecting lea targets
    that are also among-entry bases recovers each table's first entry,
    turning the stride heuristic into exact segmentation (adjacent
    tables are contiguous 32-byte struct runs the stride test can't
    split)."""
    import re

    dis = subprocess.run(["objdump", "-d", SO], capture_output=True,
                         text=True).stdout
    leas = set()
    for m in re.finditer(
            r'lea\s+-?0x[0-9a-f]+\(%rip\),%\w+\s+#\s+([0-9a-f]+)', dis):
        leas.add(int(m.group(1), 16))
    bases = set(o - 8 for o in relocs)
    return leas & bases


def extract():
    data, v2f, relocs = load()
    starts = table_starts(relocs)
    # candidate among entries: relocation at offset o where (o-8) % 32
    # aligns within a run; detect runs of stride 32 AND split at exact
    # code-referenced table starts
    offs = sorted(relocs)
    amongs = []
    cur = []
    prev = None
    for o in offs:
        tgt = relocs[o]
        f = v2f(o)
        if f is None:
            continue
        # string pointers point into .rodata; struct base = o - 8
        base = o - 8
        fb = v2f(base)
        if fb is None:
            continue
        s_size = struct.unpack_from("<i", data, fb)[0]
        if not (0 < s_size <= 40):
            if cur:
                amongs.append(cur)
                cur = []
            prev = None
            continue
        sf = v2f(tgt)
        if sf is None:
            if cur:
                amongs.append(cur)
                cur = []
            prev = None
            continue
        raw = data[sf: sf + s_size]
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.hex()
        substring_i = struct.unpack_from("<i", data, fb + 16)[0]
        result = struct.unpack_from("<i", data, fb + 20)[0]
        fn_rel = relocs.get(base + 24)
        if base in starts or (prev is not None and base - prev != 32):
            if cur:
                amongs.append(cur)
            cur = []
        cur.append((text, substring_i, result, bool(fn_rel)))
        prev = base
    if cur:
        amongs.append(cur)
    return amongs


if __name__ == "__main__":
    pat = sys.argv[1] if len(sys.argv) > 1 else None
    for i, a in enumerate(extract()):
        txt = " ".join(e[0] for e in a)
        if pat and pat not in txt:
            continue
        print(f"=== among {i} ({len(a)} entries)")
        for text, si, res, fn in a:
            print(f"   {text!r:28} sub={si:3d} res={res:3d} fn={int(fn)}")
