"""Salience formula goldens (reference phrasekit_score.rs:227-252,
docs/SALIENCE.md, FIXTURES.md §5)."""

import math

import numpy as np
import pytest

from phrasekit_ray.core import salience


def test_ratio_golden_values():
    # FIXTURES.md §5: domain 2450 / bg 5 -> 408.333...; domain 8500 / bg 125000 -> 0.068
    assert salience.ratio_salience(2450, 5) == pytest.approx(
        np.float32(2450.0) / np.float32(6.0)
    )
    v = salience.ratio_salience(8500, 125000)
    assert float(v) == pytest.approx(0.068, abs=1e-3)
    assert v.dtype == np.float32


def test_ratio_zero_background():
    assert float(salience.ratio_salience(10, 0)) == 10.0


def test_pmi_no_background_is_10():
    assert float(salience.pmi_salience(5, 0, 100, 1000)) == 10.0


def test_pmi_formula_f64_then_f32():
    d, b, td, tb = 50, 10, 1000, 100000
    expect = np.float32(math.log2((d / td) / (b / tb)))
    assert salience.pmi_salience(d, b, td, tb) == expect


def test_tfidf_formula_f32():
    d, b, td = 50, 10, 1000
    tf = np.float32(d) / np.float32(td)
    idf = np.float32(np.log(np.float32(td + 1) / np.float32(b + 1)))
    assert salience.tfidf_salience(d, b, td) == pytest.approx(float(tf * idf), rel=1e-6)
    assert salience.tfidf_salience(d, b, td).dtype == np.float32


def test_vectorized_matches_scalar():
    d = np.array([10, 20, 30], dtype=np.uint32)
    b = np.array([0, 5, 100], dtype=np.uint32)
    vec = salience.compute_salience("ratio", d, b, 60, 105)
    for i in range(3):
        assert vec[i] == salience.ratio_salience(int(d[i]), int(b[i]))
    vec = salience.compute_salience("pmi", d, b, 60, 105)
    for i in range(3):
        assert vec[i] == salience.pmi_salience(int(d[i]), int(b[i]), 60, 105)


def test_salience_score_ln_count_plus_one():
    # reference payload.rs:23-25 & policy golden: sal * ln(count+1)
    got = salience.salience_score(2.0, 100)
    assert float(got) == pytest.approx(2.0 * math.log(101.0), rel=1e-6)


def test_invalid_method_raises():
    with pytest.raises(ValueError):
        salience.compute_salience("bogus", 1, 1, 1, 1)
