"""ranger .forest file-format parity vs the REFERENCE's own vendored library.

tests/golden/golden_ranger.cpp compiles /root/reference/lib/ranger in place
(the exact code that produced and consumes the shipped
resources/forests/*.v0.7.4.forest.gz artifacts — which in this clone are
git-lfs pointers, not data, so the vendored serialiser itself is the
strongest available oracle). The harness trains a ForestProbability, saves
it with Forest::saveToFile (Forest.cpp:403-411), then predicts via the
verbatim octopus call sequence (random_forest_filter.cpp:380-391).

Our reader (load_ranger_forest) must recover the measure-name metadata and
reproduce ranger's own predictions from the serialised file, for both the
raw .forest and the gzipped .forest.gz forms the reference ships.
"""

import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_ranger")
RANGER = "/root/reference/lib/ranger"

# the germline forest measure set, in measure_factory registration order
# (src/core/csr/measures/measure_factory.cpp) — realistic names so the
# metadata round-trip is exercised on the real vocabulary
MEASURES = ["AC", "AD", "AF", "ARF", "BQ", "CC", "CRF", "DP", "FRF", "GC",
            "GQ", "MC", "MF", "MP", "MQ", "MQ0", "MQD", "PP", "PPD", "QD",
            "QUAL", "REB", "RSB", "RTB", "SB", "SD", "SF", "SHC", "SMQ",
            "SSB", "STRL", "STRP"]


def _build_golden():
    if os.path.exists(GOLDEN):
        return True
    if not os.path.isdir(RANGER):
        return False
    import glob
    cmd = ["g++", "-O2", "-std=c++17",
           "-I", os.path.dirname(GOLDEN), "-I", "/root/reference/lib",
           "-o", GOLDEN, GOLDEN + ".cpp"]
    cmd += sorted(glob.glob(os.path.join(RANGER, "*.cpp")))
    cmd += ["-lz", "-lpthread"]
    return subprocess.run(cmd, capture_output=True).returncode == 0


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    if not _build_golden():
        pytest.skip("reference ranger library unavailable")
    tmp = tmp_path_factory.mktemp("ranger")
    rng = np.random.default_rng(42)
    d = len(MEASURES)
    X = rng.normal(size=(2000, d))
    logit = X[:, 0] * 1.3 - X[:, 4] * 0.8 + X[:, 7] * 0.5 + X[:, 20] * 1.1
    y = (logit + rng.normal(size=2000) * 0.3 > 0).astype(int)
    train = tmp / "train.dat"
    with open(train, "w") as f:
        f.write(" ".join(MEASURES + ["TP"]) + "\n")
        for i in range(len(X)):
            f.write(" ".join(f"{v:.6f}" for v in X[i]) + f" {y[i]}\n")
    prefix = str(tmp / "model")
    r = subprocess.run([GOLDEN, "train", str(train), prefix, "75", "7"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    forest = prefix + ".forest"
    forest_gz = str(tmp / "model2.forest.gz")
    with open(forest, "rb") as fi, gzip.open(forest_gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    Xt = rng.normal(size=(400, d))
    test = tmp / "test.dat"
    with open(test, "w") as f:
        # prediction-time data files carry a dummy TP column, exactly as
        # octopus writes them (random_forest_filter.cpp:216-221,313-318)
        f.write(" ".join(MEASURES + ["TP"]) + "\n")
        for i in range(len(Xt)):
            f.write(" ".join(f"{v:.6f}" for v in Xt[i]) + " 0\n")
    return tmp, forest, forest_gz, str(test), Xt


def _golden_predict(forest, data, prefix):
    r = subprocess.run([GOLDEN, "predict", forest, data, prefix],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = open(prefix + ".prediction").read().splitlines()
    classes = [float(v) for v in lines[1].split()]
    col = classes.index(1.0)
    rows = [[float(v) for v in l.split()] for l in lines[3:] if l.strip()]
    return np.asarray(rows)[:, col]


def test_reader_recovers_measure_metadata(trained):
    from octopus_tpu.core.csr.random_forest import load_ranger_forest

    _, forest, forest_gz, _, _ = trained
    f = load_ranger_forest(forest)
    assert f.measures == MEASURES
    assert f.feature.shape[0] == 75
    fz = load_ranger_forest(forest_gz)
    assert fz.measures == MEASURES
    np.testing.assert_array_equal(f.feature, fz.feature)
    np.testing.assert_array_equal(f.threshold, fz.threshold)


def test_predictions_match_ranger_own(trained):
    """predict_proba on the parsed file must reproduce the reference's
    in-place prediction pipeline to the printed precision."""
    from octopus_tpu.core.csr.random_forest import load_ranger_forest

    tmp, forest, forest_gz, test, Xt = trained
    gold = _golden_predict(forest, test, str(tmp / "pred"))
    ours = load_ranger_forest(forest).predict_proba(Xt)
    assert gold.shape == ours.shape
    # the golden file prints %g (6 significant digits)
    np.testing.assert_allclose(ours, gold, atol=5e-6)
    ours_gz = load_ranger_forest(forest_gz).predict_proba(Xt)
    np.testing.assert_allclose(ours_gz, gold, atol=5e-6)


def test_shipped_artifacts_are_lfs_pointers():
    """The clone's resources/forests files are git-lfs pointers (no data in
    this environment); the reader must say so explicitly rather than
    mis-parse them. When real artifacts are present this test documents
    where direct parity would plug in."""
    from octopus_tpu.core.csr.random_forest import load_ranger_forest

    for name in ("germline", "somatic"):
        p = f"/root/reference/resources/forests/{name}.v0.7.4.forest.gz"
        if not os.path.exists(p):
            pytest.skip("reference forests not present")
        head = open(p, "rb").read(40)
        if head[:2] == b"\x1f\x8b" and b"git-lfs" not in gzip.open(p).read(60):
            # real artifact available: full load must succeed
            f = load_ranger_forest(p)
            assert len(f.measures) > 10
        else:
            with pytest.raises(ValueError, match="git-lfs"):
                load_ranger_forest(p)
