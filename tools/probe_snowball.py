"""Snowball parity probe harness (round-2 methodology, now a tool).

Ground truth: the container PostgreSQL's embedded official Snowball
stemmers, via stopword-free dictionaries in the scratch cluster at
/tmp/pgsb (`ts_lexize('raw_<lang>', word)` — see CLAUDE.md).  This
script batches words through psql and diffs against our implementation.

Usage:
    python tools/probe_snowball.py finnish stem_finnish words.txt
    python tools/probe_snowball.py finnish stem_finnish -   # builtin fuzz
"""
from __future__ import annotations

import subprocess
import sys


def pg_stems(lang: str, words: list[str]) -> list[str]:
    """ts_lexize('raw_<lang>', w) for each word, batched through psql."""
    out: list[str] = []
    for lo in range(0, len(words), 2000):
        batch = words[lo: lo + 2000]
        arr = ",".join("'" + w.replace("'", "''") + "'" for w in batch)
        sql = (
            "SELECT COALESCE((ts_lexize('raw_%s', w))[1], w) "
            "FROM unnest(ARRAY[%s]::text[]) t(w);" % (lang, arr)
        )
        r = subprocess.run(
            ["su", "-s", "/bin/sh", "nobody", "-c",
             "cd /tmp && psql -h /tmp/pgsb -d postgres -At"],
            input=sql, capture_output=True, text=True, check=True,
        )
        got = r.stdout.splitlines()
        if len(got) != len(batch):
            raise RuntimeError(
                f"psql returned {len(got)} rows for {len(batch)} words:\n"
                + r.stderr)
        out.extend(got)
    return out


def diff(lang: str, fn, words: list[str], limit: int = 40) -> int:
    exp = pg_stems(lang, words)
    bad = [(w, e, fn(w)) for w, e in zip(words, exp) if fn(w) != e]
    for w, e, g in bad[:limit]:
        print(f"  {w!r}: pg={e!r} ours={g!r}")
    print(f"{lang}: {len(bad)}/{len(words)} mismatches")
    return len(bad)


def builtin_fuzz(alphabet: str, suffixes: list[str], n: int = 8000,
                 seed: int = 1) -> list[str]:
    """Structured fuzz: random stems x suffix-rich tails + raw randoms."""
    import random

    rng = random.Random(seed)
    words = []
    for _ in range(n // 2):
        stem = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(2, 9)))
        tail = "".join(rng.choice(suffixes)
                       for _ in range(rng.randrange(0, 3)))
        words.append(stem + tail)
    for _ in range(n // 2):
        words.append("".join(rng.choice(alphabet)
                             for _ in range(rng.randrange(1, 14))))
    return sorted(set(words))


if __name__ == "__main__":
    lang, fn_name, src = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, "/root/repo")
    from tantivy_spark.functions import snowball

    fn = getattr(snowball, fn_name)
    if src == "-":
        raise SystemExit("pass a words file (builtin fuzz is per-language)")
    words = [w.strip() for w in open(src) if w.strip()]
    raise SystemExit(1 if diff(lang, fn, words) else 0)
