import numpy as np
import pytest

from octopus_tpu.core.models.subclone_vb import SubcloneModel, _vb_single


class TestVbEngine:
    def test_recovers_mixture_weights(self):
        rng = np.random.default_rng(0)
        H, N = 3, 200
        # reads from components 0 (70%) and 1 (30%)
        lnL = np.full((H, N), -10.0)
        src = rng.choice([0, 1], size=N, p=[0.7, 0.3])
        lnL[src, np.arange(N)] = -0.05
        model = SubcloneModel(n_seeds=3)
        tuples = np.array([[0, 1], [0, 2], [1, 2]])
        inf = model.evaluate(tuples, lnL)
        # the {0,1} tuple explains the data best
        assert int(np.argmax(inf.genotype_posteriors)) == 0
        a = inf.map_alphas[0]
        w = a / a.sum()
        assert abs(w[0] - 0.7) < 0.1

    def test_elbo_increases_with_better_fit(self):
        rng = np.random.default_rng(1)
        H, N = 2, 100
        lnL = np.full((H, N), -8.0)
        lnL[0] = -0.1     # all reads from hap 0
        model = SubcloneModel()
        tuples = np.array([[0, 1], [1, 1]])
        inf = model.evaluate(tuples, lnL)
        assert inf.genotype_log_evidences[0] > inf.genotype_log_evidences[1]

    def test_posteriors_normalised(self):
        rng = np.random.default_rng(2)
        lnL = -rng.exponential(2.0, (4, 50))
        model = SubcloneModel()
        tuples = np.array([[0, 1], [2, 3], [0, 3]])
        inf = model.evaluate(tuples, lnL)
        assert inf.genotype_posteriors.sum() == pytest.approx(1.0, abs=1e-6)
