"""Replays the reference's fieldnorm round-trip assertions
(src/fieldnorm/code.rs:262-299)."""

import numpy as np

from tantivy_spark.functions.fieldnorm import (
    FIELD_NORMS_TABLE,
    MAX_FIELDNORM,
    fieldnorm_to_id,
    id_to_fieldnorm,
)


def test_identity_below_41():
    for i in range(41):
        assert fieldnorm_to_id(i) == i


def test_rounding_down():
    assert fieldnorm_to_id(41) == 40
    assert fieldnorm_to_id(42) == 41


def test_round_trip_all_ids():
    for idx in range(43, 256):
        fn = int(FIELD_NORMS_TABLE[idx])
        assert id_to_fieldnorm(idx) == fn
        assert fieldnorm_to_id(fn) == idx
        assert fieldnorm_to_id(fn - 1) == idx - 1
        assert fieldnorm_to_id(fn + 1) == idx


def test_u32_max():
    assert fieldnorm_to_id(2**32 - 1) == 255


def test_max_value():
    assert MAX_FIELDNORM == 2_013_265_944


def test_table_strictly_increasing():
    assert np.all(np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0)


def test_vectorized():
    vals = np.array([0, 1, 40, 41, 42, 10**6, 2**31])
    ids = fieldnorm_to_id(vals)
    assert ids.dtype == np.uint8
    assert list(ids[:5]) == [0, 1, 40, 40, 41]
