"""Random-forest call filtering with vectorised tree-ensemble inference.

Capability-equivalent to the reference's RandomForestFilter
(src/core/csr/filters/random_forest_filter.{hpp,cpp}) which feeds measure
vectors through a vendored ranger ForestProbability and emits
RFGQ = phred(P(error)).  Here the ensemble is stored as dense arrays
(feature index / threshold / child pointers / leaf probability per node) so
a whole call batch evaluates as a handful of device gathers — a
TPU-friendly formulation of forest inference.  Forests are stored as .npz;
a bundled trainer (bootstrap + greedy CART) lets users fit forests from
labelled measure tables (the role of the reference's scripts/forest.smk
pipeline; ranger .forest files themselves are not readable without ranger —
documented deviation).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Forest:
    """Dense node-array ensemble. All arrays (n_trees, max_nodes)."""

    feature: np.ndarray     # int32, -1 at leaves
    threshold: np.ndarray   # float32
    left: np.ndarray        # int32 child index
    right: np.ndarray       # int32
    value: np.ndarray       # float32 leaf P(true positive)
    measures: list[str]     # feature names, order defines the input vector

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """(n_samples,) P(true positive); X (n_samples, n_features)."""
        n_trees = self.feature.shape[0]
        n = X.shape[0]
        votes = np.zeros(n)
        for t in range(n_trees):
            node = np.zeros(n, np.int64)
            feat = self.feature[t]
            thr = self.threshold[t]
            left = self.left[t]
            right = self.right[t]
            # fixed-depth loop: all trees are depth-bounded at build time
            for _ in range(64):
                f = feat[node]
                done = f < 0
                if done.all():
                    break
                go_left = X[np.arange(n), np.maximum(f, 0)] <= thr[node]
                nxt = np.where(go_left, left[node], right[node])
                node = np.where(done, node, nxt)
            votes += self.value[t][node]
        return votes / n_trees

    def save(self, path: str) -> None:
        np.savez_compressed(path, feature=self.feature, threshold=self.threshold,
                            left=self.left, right=self.right, value=self.value,
                            measures=np.asarray(self.measures))

    @staticmethod
    def load(path: str) -> "Forest":
        z = np.load(path, allow_pickle=False)
        return Forest(z["feature"], z["threshold"], z["left"], z["right"],
                      z["value"], [str(m) for m in z["measures"]])


# ---------------------------------------------------------------------------
# Trainer: bootstrap bagging + greedy gini CART (scripts/forest.smk role)
# ---------------------------------------------------------------------------

def train_forest(X: np.ndarray, y: np.ndarray, measures: list[str],
                 n_trees: int = 50, max_depth: int = 8,
                 min_leaf: int = 5, seed: int = 0) -> Forest:
    rng = np.random.default_rng(seed)
    n, d = X.shape
    max_nodes = 2 ** (max_depth + 1)
    feature = np.full((n_trees, max_nodes), -1, np.int32)
    threshold = np.zeros((n_trees, max_nodes), np.float32)
    left = np.zeros((n_trees, max_nodes), np.int32)
    right = np.zeros((n_trees, max_nodes), np.int32)
    value = np.zeros((n_trees, max_nodes), np.float32)
    m_try = max(1, int(np.sqrt(d)))
    for t in range(n_trees):
        idx = rng.integers(0, n, n)
        Xb, yb = X[idx], y[idx]
        next_node = [1]

        def build(node, rows, depth):
            ys = yb[rows]
            value[t, node] = ys.mean() if len(ys) else 0.5
            if depth >= max_depth or len(rows) < 2 * min_leaf or ys.min() == ys.max():
                return
            feats = rng.choice(d, m_try, replace=False)
            best = None
            parent_gini = _gini(ys)
            for f in feats:
                xs = Xb[rows, f]
                order = np.argsort(xs)
                xs_sorted = xs[order]
                ys_sorted = ys[order]
                csum = np.cumsum(ys_sorted)
                total = csum[-1]
                nn = len(rows)
                ks = np.arange(min_leaf, nn - min_leaf)
                if len(ks) == 0:
                    continue
                valid = xs_sorted[ks - 1] < xs_sorted[ks]
                if not valid.any():
                    continue
                ks = ks[valid]
                p_l = csum[ks - 1] / ks
                p_r = (total - csum[ks - 1]) / (nn - ks)
                g = (ks * p_l * (1 - p_l) + (nn - ks) * p_r * (1 - p_r)) / nn
                k = ks[np.argmin(g)]
                gval = g.min()
                if best is None or gval < best[0]:
                    best = (gval, f, (xs_sorted[k - 1] + xs_sorted[k]) / 2)
            if best is None or best[0] >= parent_gini:
                return
            _, f, thr = best
            if next_node[0] + 2 > max_nodes:
                return
            l, r = next_node[0], next_node[0] + 1
            next_node[0] += 2
            feature[t, node] = f
            threshold[t, node] = thr
            left[t, node] = l
            right[t, node] = r
            go = Xb[rows, f] <= thr
            build(l, rows[go], depth + 1)
            build(r, rows[~go], depth + 1)

        build(0, np.arange(n), 0)
    return Forest(feature, threshold, left, right, value, list(measures))


def _gini(y: np.ndarray) -> float:
    if len(y) == 0:
        return 0.0
    p = y.mean()
    return float(p * (1 - p))


class RandomForestFilter:
    """Classifies calls; RFGQ = phred(P(error)), failing below min quality
    (random_forest_filter.hpp min-forest-quality default 3)."""

    def __init__(self, forest: Forest, min_quality: float = 3.0):
        self.forest = forest
        self.min_quality = min_quality

    def classify(self, measure_dicts: list[dict]) -> tuple[np.ndarray, list[list[str]]]:
        X = np.asarray([[float(m.get(k, 0.0)) for k in self.forest.measures]
                        for m in measure_dicts])
        if len(X) == 0:
            return np.zeros(0), []
        p_good = self.forest.predict_proba(X)
        p_err = np.clip(1 - p_good, 1e-10, 1)
        rfgq = -10 * np.log10(p_err)
        fails = [[] if q >= self.min_quality else ["RF"] for q in rfgq]
        return rfgq, fails


__all__ = ["Forest", "train_forest", "RandomForestFilter"]
