"""Empirical parity probe: Java-regex/JVM-lower vs the Python default
analyzer, per Unicode codepoint.

The default analyzer (functions/analysis.py) is the parity oracle for the
reference's SimpleTokenizer -> RemoveLong(40) -> LowerCaser chain.  Before
the index build's tokenize hot path can move JVM-side (Catalyst
regexp_extract_all + filter(octet_length) + transform(lower)), the JVM
expressions must agree with the Python analyzer on EVERY codepoint —
a single divergent char silently splits the index vocabulary from the
query-side analyzer.

Prints the divergent codepoint sets:
  class:  Python isalnum (`[^\\W_]`) vs Java `[\\p{L}\\p{N}]`
  lower:  Python per-char str.lower vs Spark lower() (after the
          final-sigma translate guard)
"""
from __future__ import annotations

import sys
import unicodedata

import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tantivy_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe_jvm_tokenize", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    cps = [cp for cp in range(0x110000) if not (0xD800 <= cp <= 0xDFFF)]
    pdf = pd.DataFrame({"cp": cps, "ch": [chr(cp) for cp in cps]})
    df = spark.createDataFrame(pdf).persist()

    jvm = df.select(
        "cp",
        F.col("ch").rlike(r"^[\p{L}\p{N}]$").alias("j_alnum"),
        F.lower(F.translate("ch", "Σ", "σ")).alias("j_lower"),
    ).toPandas().set_index("cp")

    py_alnum = pdf["ch"].map(str.isalnum).to_numpy()
    py_lower = pdf["ch"].map(
        lambda c: c.lower() if not c.isascii() else c.lower()
    ).to_numpy()

    j_alnum = jvm["j_alnum"].to_numpy()
    j_lower = jvm["j_lower"].to_numpy()

    class_diff = [
        (cp, unicodedata.name(chr(cp), "?"), bool(pa), bool(ja))
        for cp, pa, ja in zip(pdf["cp"], py_alnum, j_alnum)
        if bool(pa) != bool(ja)
    ]
    # lowercase only matters for chars that tokenize as word chars in
    # BOTH engines (others never reach the lowercaser)
    lower_diff = [
        (cp, unicodedata.name(chr(cp), "?"), repr(pl), repr(jl))
        for cp, pa, ja, pl, jl in zip(
            pdf["cp"], py_alnum, j_alnum, py_lower, j_lower)
        if bool(pa) and bool(ja) and pl != jl
    ]

    print(f"CLASS divergences (py_isalnum vs java [\\p{{L}}\\p{{N}}]): "
          f"{len(class_diff)}")
    for cp, name, pa, ja in class_diff[:200]:
        print(f"  U+{cp:04X} {name}: py={pa} java={ja}")
    if len(class_diff) > 200:
        print(f"  ... and {len(class_diff) - 200} more")

    print(f"LOWER divergences (both-word chars only): {len(lower_diff)}")
    for cp, name, pl, jl in lower_diff[:200]:
        print(f"  U+{cp:04X} {name}: py={pl} java={jl}")
    if len(lower_diff) > 200:
        print(f"  ... and {len(lower_diff) - 200} more")

    # machine-readable summary for building the patched character class
    print("CLASS_PY_ONLY =", sorted(cp for cp, _, pa, _ in class_diff if pa))
    print("CLASS_JAVA_ONLY =", sorted(cp for cp, _, pa, _ in class_diff if not pa))
    print("LOWER_DIFF_CPS =", sorted(cp for cp, _, _, _ in lower_diff))


if __name__ == "__main__":
    main()
