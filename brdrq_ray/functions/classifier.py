"""Quality classifier: hashed-n-gram logistic regression (the GPT-3 /
CCNet-family "looks like the reference corpus" filter, Brown et al. 2020
appendix A).

Train on a positive corpus (trusted text) vs a negative corpus (raw crawl):
features are the same hashed uni/bigram buckets as ``text.train_ngram_lm``
(term frequencies, plus a bias term), the model is plain logistic regression
fit by FULL-BATCH gradient descent — each epoch is ONE streaming pass where
every batch emits its gradient partial (a dense (2*n_buckets+1) float64
vector + loss/count scalars), the driver sums the bounded partials and takes
the step. Full-batch means NO SGD shuffle/order sensitivity: re-running the
same input partitioning reproduces w bit-for-bit, and different
partitionings agree to float-summation rounding (~1e-12 relative — the
gradient SUM is the same real number, only the addition order moves), which
the tests pin. Scoring is a broadcast-weights actor pool.

At 100 TB: epochs are linear scans (the corpus never shuffles); the per-batch
gradient blob is n_buckets-sized (default 2^16 -> 1 MB), mergeable like the
k-means/HLL partials; with E epochs the total I/O is E scans of the LABELED
training sample (normally a bounded subsample of each corpus, not 100 TB —
the classifier is cheap, the corpus it scores is the big thing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _doc_features(texts, n_buckets: int):
    """Sparse doc features: (doc_idx, feature_idx, value) with features =
    uni buckets [0, nb) + bigram buckets [nb, 2nb) as term FREQUENCIES
    (counts / total grams per doc; empty docs get only the bias, which the
    caller adds). Shares the LM gram kernel."""
    from .text import _lm_gram_buckets

    doc_idx, uni_b, bi_b, lens = _lm_gram_buckets(texts, n_buckets)
    n = len(lens)
    bi_doc = np.repeat(np.arange(n), np.maximum(lens - 1, 0))
    feat = np.concatenate([uni_b, bi_b + n_buckets])
    docs = np.concatenate([doc_idx, bi_doc])
    totals = np.maximum(lens + np.maximum(lens - 1, 0), 1)  # grams per doc
    vals = 1.0 / totals[docs]
    # collapse repeated (doc, feature) occurrences into one weighted entry
    key = docs * np.int64(2 * n_buckets) + feat
    uk, inv = np.unique(key, return_inverse=True)
    v = np.bincount(inv, weights=vals)
    return (uk // (2 * n_buckets)).astype(np.int64), \
           (uk % (2 * n_buckets)).astype(np.int64), v


def _margins(docs, feats, vals, n_docs: int, w: np.ndarray,
             n_buckets: int) -> np.ndarray:
    m = np.full(n_docs, w[-1])                      # bias
    if len(docs):
        m += np.bincount(docs, weights=vals * w[feats], minlength=n_docs)
    return m


def train_quality_classifier(pos: ray.data.Dataset, neg: ray.data.Dataset,
                             col: str = "text", n_buckets: int = 1 << 16,
                             epochs: int = 30, lr: float = 2.0,
                             l2: float = 1e-6) -> dict:
    """Fit the logistic regression. Returns {'w', 'n_buckets', 'losses'}
    (w = 2*n_buckets feature weights + trailing bias; losses = per-epoch
    mean log-loss, a convergence audit trail)."""

    def lab(ds, y):
        def add(t: pa.Table) -> pa.Table:
            return pa.table({col: t.column(col),
                             "__y": pa.array(np.full(t.num_rows, y,
                                                     dtype=np.float64))})
        return ds.map_batches(add, batch_format="pyarrow")

    # label, then pin: E epochs re-scan this (bounded training-sample-sized)
    # union — materialize once instead of re-reading the sources per epoch
    train = lab(pos, 1.0).union(lab(neg, 0.0)).materialize()

    dim = 2 * n_buckets + 1
    w = np.zeros(dim, dtype=np.float64)
    losses: list[float] = []
    for _ in range(epochs):
        wref = ray.put(w)

        def grad_partial(batch: pa.Table) -> pa.Table:
            ww = ray.get(wref)
            texts = batch.column(col).to_pylist()
            y = batch.column("__y").to_numpy(zero_copy_only=False)
            docs, feats, vals = _doc_features(texts, n_buckets)
            m = _margins(docs, feats, vals, len(y), ww, n_buckets)
            p = 1.0 / (1.0 + np.exp(-m))
            err = p - y                              # dL/dmargin
            g = np.zeros(dim, dtype=np.float64)
            if len(docs):
                np.add.at(g, feats, err[docs] * vals)
            g[-1] = err.sum()
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table({"g": pa.array([g.tobytes()], pa.binary()),
                             "loss": pa.array([float(loss)], pa.float64()),
                             "n": pa.array([len(y)], pa.int64())})

        parts = train.map_batches(grad_partial, batch_format="pyarrow") \
                     .to_pandas()
        g = np.zeros(dim, dtype=np.float64)
        for buf in parts["g"]:
            g += np.frombuffer(buf, dtype=np.float64)
        n_total = int(parts["n"].sum())
        losses.append(float(parts["loss"].sum()) / max(n_total, 1))
        w = w - lr * (g / max(n_total, 1) + l2 * w)
    return {"w": w, "n_buckets": n_buckets, "losses": losses}


class ClassifierScoreStage:
    """Actor stage: broadcast weights fetched once per actor; appends
    ``clf_prob`` = sigmoid(w . x), the probability the doc looks like the
    positive (trusted) corpus."""

    def __init__(self, model_ref, col: str = "text"):
        model = (ray.get(model_ref)
                 if not isinstance(model_ref, dict) else model_ref)
        self.w = model["w"]
        self.nb = model["n_buckets"]
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        docs, feats, vals = _doc_features(texts, self.nb)
        m = _margins(docs, feats, vals, batch.num_rows, self.w, self.nb)
        p = 1.0 / (1.0 + np.exp(-m))
        return batch.append_column("clf_prob", pa.array(p, pa.float64()))


def classifier_score(ds, model: dict, col: str = "text"):
    """Append ``clf_prob`` to every row (broadcast model, actor pool)."""
    mref = ray.put({"w": model["w"], "n_buckets": model["n_buckets"]})
    return ds.map_batches(ClassifierScoreStage,
                          fn_constructor_kwargs=dict(model_ref=mref, col=col),
                          batch_format="pyarrow", concurrency=_pool())

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()
