"""Deterministic synthetic multi-turn transcripts (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
  (conv_id string, turn_idx int, role string, text string, tool string,
   ts timestamp)

Generation is seeded and pure-deterministic per conversation ordinal, so it
can run distributed (one conversation batch per task) and any two runs at
any parallelism produce identical rows.  Text draws 5-120 tokens from a
Zipf(s=1.1) distribution over a 30k synthetic vocabulary, plus tokenizer
edge cases: punctuation compounds, non-ASCII tokens, >=40-byte tokens (the
analyzer must drop them), digits and mixed case.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 30_000
ZIPF_S = 1.1
SEED = 42
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)  # session TZ = UTC

_NON_ASCII = ["héllo", "Grüße", "ΣΊΣΥΦΟΣ", "東京", "naïve", "Ωμέγα"]
_TOOLS = ["search", "python", "browser"]
_ROLES = ["user", "assistant", "tool"]
_ROLE_P = [0.40, 0.45, 0.15]


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()
    return np.cumsum(p)


_CDF = _zipf_cdf()


def generate_conversations(conv_ordinals: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Rows for the given conversation ordinals — deterministic per ordinal."""
    out_conv: list[str] = []
    out_turn: list[int] = []
    out_role: list[str] = []
    out_text: list[str] = []
    out_tool: list[object] = []
    out_ts: list[object] = []
    long_token = "x" * 45  # 45 ASCII bytes -> dropped by RemoveLong(40)

    for i in np.asarray(conv_ordinals, dtype=np.int64):
        rng = np.random.default_rng(seed + int(i) * 1_000_003)
        n_turns = 1 + int(rng.integers(0, 12))
        conv_id = f"conv{int(i):08d}"
        roles = rng.choice(_ROLES, size=n_turns, p=_ROLE_P)
        for t in range(n_turns):
            n_tok = int(rng.integers(5, 121))
            word_ids = np.searchsorted(_CDF, rng.random(n_tok))
            words = [f"w{wid}" for wid in word_ids]
            r = rng.random(n_tok)
            for j in range(n_tok):
                if r[j] < 0.02:
                    words[j] = words[j] + "-" + f"w{int(rng.integers(0, VOCAB_SIZE))}"
                elif r[j] < 0.03:
                    words[j] = _NON_ASCII[int(rng.integers(0, len(_NON_ASCII)))]
                elif r[j] < 0.035:
                    words[j] = long_token
                elif r[j] < 0.055:
                    words[j] = str(int(rng.integers(0, 100000)))
                elif r[j] < 0.075:
                    words[j] = words[j].upper() if rng.random() < 0.5 else words[j].capitalize()
            out_conv.append(conv_id)
            out_turn.append(t)
            out_role.append(str(roles[t]))
            out_text.append(" ".join(words))
            out_tool.append(
                None if rng.random() < 0.85 else _TOOLS[int(rng.integers(0, 3))]
            )
            out_ts.append(_EPOCH + pd.Timedelta(seconds=37 * (int(i) * 13 + t)))

    return pd.DataFrame(
        {
            "conv_id": out_conv,
            "turn_idx": np.asarray(out_turn, dtype=np.int32),
            "role": out_role,
            "text": out_text,
            "tool": out_tool,
            "ts": out_ts,
        }
    )


def transcripts_df(spark: SparkSession, n_convs: int, seed: int = SEED,
                   partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator: one ordinal-range per task."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield generate_conversations(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=schema)
    )


def transcripts_pdf(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Driver-side generator for small test corpora (identical rows)."""
    return generate_conversations(np.arange(n_convs), seed)
