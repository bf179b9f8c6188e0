"""DDSketch unit tests (pure numpy — no Spark session needed).

Mirrors the reference's percentile guarantees: the sketch promises
relative error <= alpha on every quantile (percentiles.rs doc section
'Estimating Percentiles'; sketches-ddsketch defaults alpha=0.01)."""

import numpy as np
import pytest

from tantivy_spark.functions.ddsketch import DDSketch


def _check_relative_error(values, qs, alpha=0.01, slack=2.5):
    s = DDSketch(alpha=alpha)
    s.add(values)
    v = np.sort(np.asarray(values, dtype=np.float64))
    for q in qs:
        est = s.quantile(q)
        true = v[int(q * (len(v) - 1))]
        if abs(true) < 1e-9:
            assert abs(est) < 1e-6
        else:
            rel = abs(est - true) / abs(true)
            assert rel <= alpha * slack, (q, est, true, rel)


def test_lognormal_quantiles():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=3.0, sigma=1.0, size=50_000)
    _check_relative_error(vals, [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])


def test_negative_and_mixed_values():
    rng = np.random.default_rng(8)
    vals = np.concatenate([
        -rng.lognormal(2.0, 0.5, 20_000),
        np.zeros(137),
        rng.lognormal(2.0, 0.5, 20_000),
    ])
    rng.shuffle(vals)
    _check_relative_error(vals, [0.05, 0.25, 0.5, 0.75, 0.95])


def test_merge_equals_single_pass():
    rng = np.random.default_rng(9)
    vals = rng.lognormal(1.5, 0.8, 30_000)
    whole = DDSketch()
    whole.add(vals)
    parts = [DDSketch() for _ in range(7)]
    for i, chunk in enumerate(np.array_split(vals, 7)):
        parts[i].add(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.count == whole.count == len(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert merged.quantile(q) == pytest.approx(whole.quantile(q))


def test_serialization_roundtrip():
    rng = np.random.default_rng(10)
    vals = np.concatenate([rng.lognormal(2, 1, 5000), -rng.lognormal(1, 1, 5000)])
    s = DDSketch()
    s.add(vals)
    k, c, z = s.to_arrays()
    s2 = DDSketch.from_arrays(k, c, z)
    assert s2.count == s.count
    for q in (0.05, 0.5, 0.95):
        assert s2.quantile(q) == pytest.approx(s.quantile(q))


def test_empty_and_edge():
    s = DDSketch()
    assert s.quantile(0.5) is None
    s.add([5.0])
    assert s.quantile(0.0) == pytest.approx(5.0, rel=0.01)
    assert s.quantile(1.0) == pytest.approx(5.0, rel=0.01)


def test_determinism():
    rng = np.random.default_rng(11)
    vals = rng.lognormal(2, 1, 10_000)
    a, b = DDSketch(), DDSketch()
    a.add(vals)
    b.add(vals)
    assert a.to_arrays()[0].tolist() == b.to_arrays()[0].tolist()
    assert a.quantile(0.5) == b.quantile(0.5)
