"""Porter2 (Snowball English) stemmer vectors + en_stem analyzer chain.

Vectors from the published Snowball sample vocabulary
(https://snowballstem.org/algorithms/english/stemmer.html) — the algorithm
behind the reference's `en_stem` tokenizer
(/root/reference/src/tokenizer/stemmer.rs, tokenizer_manager.rs:66-76).
"""

import pytest

from tantivy_spark.functions.analysis import tokenize_en_stem
from tantivy_spark.functions.porter2 import stem

VECTORS = {
    "consigned": "consign", "consistency": "consist", "consolations": "consol",
    "consolidating": "consolid", "conspicuously": "conspicu",
    "conspirators": "conspir", "constables": "constabl", "knackeries": "knackeri",
    "kneaded": "knead", "knees": "knee", "knavish": "knavish", "knife": "knife",
    "knightly": "knight", "knitted": "knit", "knives": "knive",
    "knocker": "knocker",
    # special forms + exceptions
    "dying": "die", "lying": "lie", "tying": "tie", "skies": "sky",
    "skis": "ski", "early": "earli", "only": "onli", "singly": "singl",
    "news": "news", "proceed": "proceed", "exceeding": "exceed",
    # 1b shortening / doubling / e-restoration
    "hopping": "hop", "hoping": "hope", "hopped": "hop", "agreed": "agre",
    # region prefixes
    "generously": "generous", "generate": "generat", "communication": "communic",
    "arsenal": "arsenal",
    # step 2-4 chains
    "ization": "izat", "national": "nation", "rational": "ration",
    "sensational": "sensat", "conditionally": "condit", "beautifully": "beauti",
    "happiness": "happi", "happily": "happili",
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_porter2_vectors(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    assert stem("at") == "at"
    assert stem("a") == "a"


def test_en_stem_analyzer_chain():
    terms, positions = tokenize_en_stem("The Knights were KNITTING, hoping!")
    assert terms == ["the", "knight", "were", "knit", "hope"]
    assert positions == [0, 1, 2, 3, 4]


def test_en_stem_long_filter_applies_before_stem():
    long_tok = "x" * 45
    terms, _ = tokenize_en_stem(f"running {long_tok} jumping")
    assert terms == ["run", "jump"]
