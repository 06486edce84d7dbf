import numpy as np
import pytest

from octopus_tpu.core.csr.random_forest import (
    Forest, train_forest, RandomForestFilter)


def synth_data(n=2000, seed=0):
    """TP calls: high QUAL/MQ/AF; FP calls: low + strand biased."""
    rng = np.random.default_rng(seed)
    y = rng.random(n) < 0.5
    X = np.zeros((n, 4))
    X[:, 0] = np.where(y, rng.normal(200, 60, n), rng.normal(25, 15, n))   # QUAL
    X[:, 1] = np.where(y, rng.normal(58, 3, n), rng.normal(35, 12, n))     # MQ
    X[:, 2] = np.where(y, rng.normal(0.5, 0.1, n), rng.normal(0.1, 0.07, n))  # AF
    X[:, 3] = np.where(y, rng.random(n) * 0.5, 0.5 + rng.random(n) * 0.5)  # SB
    return X, y.astype(np.float64)


def test_train_and_classify():
    X, y = synth_data()
    forest = train_forest(X, y, ["QUAL", "MQ", "AF", "SB"], n_trees=30)
    Xt, yt = synth_data(seed=1)
    p = forest.predict_proba(Xt)
    acc = ((p > 0.5) == (yt > 0.5)).mean()
    assert acc > 0.9, acc


def test_save_load_roundtrip(tmp_path):
    X, y = synth_data(n=500)
    forest = train_forest(X, y, ["QUAL", "MQ", "AF", "SB"], n_trees=10)
    path = tmp_path / "f.npz"
    forest.save(str(path))
    loaded = Forest.load(str(path))
    np.testing.assert_array_equal(loaded.feature, forest.feature)
    np.testing.assert_allclose(loaded.predict_proba(X[:50]),
                               forest.predict_proba(X[:50]))


def test_filter_classification():
    X, y = synth_data()
    forest = train_forest(X, y, ["QUAL", "MQ", "AF", "SB"], n_trees=30)
    f = RandomForestFilter(forest)
    good = {"QUAL": 250.0, "MQ": 60.0, "AF": 0.5, "SB": 0.1}
    bad = {"QUAL": 5.0, "MQ": 20.0, "AF": 0.05, "SB": 0.99}
    rfgq, fails = f.classify([good, bad])
    assert fails[0] == []
    assert fails[1] == ["RF"]
    assert rfgq[0] > rfgq[1]
