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


class TestRangerReader:
    """load_ranger_forest against a byte-faithful synthetic ranger file
    (serialization layout from lib/ranger/Forest.cpp:841-905,
    ForestProbability.cpp:275-315, utility.h saveVector1D/2D)."""

    @staticmethod
    def _write_ranger(path, gz=False):
        import struct, gzip
        out = bytearray()

        def u32(v): out.extend(struct.pack("<I", v))
        def u64(v): out.extend(struct.pack("<Q", v))
        def s(x):
            u64(len(x)); out.extend(x.encode())
        def vec(fmt, vals):
            u64(len(vals))
            for v in vals: out.extend(struct.pack(fmt, v))
        def vecb(vals):
            u64(len(vals))
            for v in vals: out.extend(struct.pack("<B", int(v)))
        def vec2(fmt, rows):
            u64(len(rows))
            for r in rows: vec(fmt, r)

        u32(1); s("TP")                       # dependent variable
        u32(2); s("QUAL"); s("MQ")            # independent variables
        u64(2)                                 # num_trees
        vecb([1, 1])                           # ordered indicators
        u32(9)                                 # TREE_PROBABILITY
        vec("<d", [0.0, 1.0])                  # class_values
        # tree 0: root splits on var0 (QUAL) <= 10 -> leaf1 else leaf2
        vec2("<Q", [[1, 0, 0], [2, 0, 0]])     # child_nodeIDs L/R
        vec("<Q", [0, 0, 0])                   # split_varIDs
        vec("<d", [10.0, 0.0, 0.0])            # split_values
        vec("<Q", [1, 2])                      # terminal nodes
        vec2("<d", [[8.0, 2.0], [1.0, 9.0]])   # class counts (c0, c1)
        # tree 1: split on var1 (MQ) <= 30
        vec2("<Q", [[1, 0, 0], [2, 0, 0]])
        vec("<Q", [1, 0, 0])
        vec("<d", [30.0, 0.0, 0.0])
        vec("<Q", [1, 2])
        vec2("<d", [[6.0, 4.0], [0.0, 10.0]])
        data = bytes(out)
        if gz:
            data = gzip.compress(data)
        open(path, "wb").write(data)

    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, gz):
        from octopus_tpu.core.csr.random_forest import load_ranger_forest
        p = str(tmp_path / ("f.forest.gz" if gz else "f.forest"))
        self._write_ranger(p, gz=gz)
        f = load_ranger_forest(p)
        assert f.measures == ["QUAL", "MQ"]
        assert f.feature.shape[0] == 2
        # sample QUAL=5, MQ=50: tree0 -> leaf1 p=.2 ; tree1 -> leaf2 p=1.0
        p1 = f.predict_proba(np.asarray([[5.0, 50.0]]))[0]
        assert p1 == pytest.approx((0.2 + 1.0) / 2)
        # sample QUAL=20, MQ=20: tree0 leaf2 p=.9 ; tree1 leaf1 p=.4
        p2 = f.predict_proba(np.asarray([[20.0, 20.0]]))[0]
        assert p2 == pytest.approx((0.9 + 0.4) / 2)

    def test_lfs_pointer_rejected(self, tmp_path):
        from octopus_tpu.core.csr.random_forest import load_ranger_forest
        p = str(tmp_path / "x.forest")
        open(p, "wb").write(b"version https://git-lfs.github.com/spec/v1\n")
        with pytest.raises(ValueError, match="git-lfs"):
            load_ranger_forest(p)
