"""Hashed-n-gram logistic-regression quality classifier."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.classifier import (
    _doc_features,
    _margins,
    classifier_score,
    train_quality_classifier,
)

NB = 1 << 12

POS = ["the cat sat on the mat and watched the quiet rain",
       "a dog walked along the river past the old stone bridge",
       "the children played in the garden under the evening light",
       "she carried a basket of bread and fruit through the market"]
NEG = ["buy cheap pills now click here win win win",
       "zzz qqq xxx free money casino jackpot spin spin",
       "subscribe like follow smash that bell button now now",
       "hot deals hot deals limited offer act fast buy buy"]


def _ds(texts, parts=None):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    return ds.repartition(parts) if parts else ds


def test_features_are_per_doc_frequencies():
    docs, feats, vals = _doc_features(["a b a", ""], NB)
    # doc 0: grams = 3 words + 2 bigrams = 5 -> values sum to 1
    assert np.isclose(vals[docs == 0].sum(), 1.0)
    # empty doc contributes nothing (bias handled by the margin)
    assert not (docs == 1).any()
    m = _margins(docs, feats, vals, 2, np.zeros(2 * NB + 1), NB)
    assert m.tolist() == [0.0, 0.0]


def test_training_separates_and_converges(ray_session):
    clf = train_quality_classifier(_ds(POS), _ds(NEG), n_buckets=NB,
                                   epochs=40, lr=4.0)
    # loss audit trail: strictly decreasing over training
    assert clf["losses"][-1] < clf["losses"][0] * 0.7
    scored = classifier_score(
        _ds(POS + NEG).repartition(3), clf).to_pandas()
    probs = dict(zip(scored["text"], scored["clf_prob"]))
    for t in POS:
        assert probs[t] > 0.5, t
    for t in NEG:
        assert probs[t] < 0.5, t
    # held-out docs from each style land on the right side
    held = classifier_score(_ds([
        "the boat drifted past the green reeds in the morning light",
        "win free money now click click click buy now"]), clf).to_pandas()
    assert held["clf_prob"][0] > held["clf_prob"][1]


def test_training_deterministic_rerun(ray_session):
    a = train_quality_classifier(_ds(POS), _ds(NEG), n_buckets=NB, epochs=5)
    b = train_quality_classifier(_ds(POS), _ds(NEG), n_buckets=NB, epochs=5)
    assert np.array_equal(a["w"], b["w"])
    assert a["losses"] == b["losses"]


def test_partitioning_agrees_to_rounding(ray_session):
    a = train_quality_classifier(_ds(POS), _ds(NEG), n_buckets=NB, epochs=5)
    b = train_quality_classifier(_ds(POS, parts=3), _ds(NEG, parts=2),
                                 n_buckets=NB, epochs=5)
    np.testing.assert_allclose(a["w"], b["w"], rtol=1e-9, atol=1e-12)


def test_gradient_partial_matches_numpy_oracle(ray_session):
    """One epoch from w=0 over a single batch must take exactly the step the
    closed-form full-batch gradient dictates."""
    texts = POS[:2] + NEG[:2]
    y = np.array([1.0, 1.0, 0.0, 0.0])
    clf = train_quality_classifier(_ds(texts[:2]), _ds(texts[2:]),
                                   n_buckets=NB, epochs=1, lr=1.0, l2=0.0)
    docs, feats, vals = _doc_features(texts, NB)
    # at w=0 every p = 0.5 -> err = 0.5 - y
    err = 0.5 - y
    g = np.zeros(2 * NB + 1)
    np.add.at(g, feats, err[docs] * vals)
    g[-1] = err.sum()
    want = -1.0 * g / len(y)
    np.testing.assert_allclose(clf["w"], want, rtol=1e-12, atol=1e-15)
