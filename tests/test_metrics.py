"""SRCC/MSE evaluator tests against scipy's reference implementation."""

import numpy as np
import pytest

from srsem.train.metrics import mse, srcc

scipy_stats = pytest.importorskip("scipy.stats")


def test_srcc_matches_scipy(np_rng):
    x = np_rng.standard_normal(100)
    y = 0.3 * x + np_rng.standard_normal(100)
    expected = scipy_stats.spearmanr(x, y).statistic
    assert srcc(x, y) == pytest.approx(expected, abs=1e-12)


def test_srcc_with_ties_matches_scipy(np_rng):
    x = np_rng.integers(0, 5, 200).astype(float)  # heavy ties
    y = np_rng.integers(0, 3, 200).astype(float)
    expected = scipy_stats.spearmanr(x, y).statistic
    assert srcc(x, y) == pytest.approx(expected, abs=1e-12)


def test_srcc_perfect_and_inverse():
    x = np.arange(10.0)
    assert srcc(x, x) == pytest.approx(1.0)
    assert srcc(x, -x) == pytest.approx(-1.0)


def test_mse():
    assert mse([1.0, 2.0], [0.0, 4.0]) == pytest.approx(2.5)
