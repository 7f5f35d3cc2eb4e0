"""Hashed n-gram LM (CCNet-style perplexity proxy) — brute-force oracle.

The oracle rebuilds the counts with per-word Python dicts (same hash
primitives, scalar calls) and rescoring applies the stupid-backoff formula
token by token; the tests pin the vectorized train/score kernels to it.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.text import (
    _LM_BACKOFF,
    _lm_bits_for_texts,
    lm_score,
    train_ngram_lm,
)
from brdrq_ray.functions.vhash import hash64, splitmix64

REF_DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat and the dog sat",
    "on the mat sat a cat",
]
CAND_DOCS = [
    "the cat sat on the mat",     # in-distribution
    "zebra quark flux entropy",   # out-of-distribution
    "the dog",                    # short
    "cat",                        # single token
    "",                           # empty
]
NB = 4096


def _wh(word: str) -> int:
    return int(hash64(np.array([word], dtype=object))[0])


def _bi(w1: str, w2: str) -> int:
    a = splitmix64(np.array([_wh(w1)], dtype=np.uint64))
    return int(splitmix64(a ^ np.uint64(_wh(w2)))[0])


def _oracle_model(docs, n_buckets):
    uni, bi, total = {}, {}, 0
    for d in docs:
        ws = d.lower().split()
        total += len(ws)
        for w in ws:
            b = _wh(w) % n_buckets
            uni[b] = uni.get(b, 0) + 1
        for w1, w2 in zip(ws, ws[1:]):
            b = _bi(w1, w2) % n_buckets
            bi[b] = bi.get(b, 0) + 1
    return uni, bi, total


def _oracle_bits(doc, uni, bi, total, n_buckets):
    ws = doc.lower().split()
    if not ws:
        return float("nan")
    denom = total + n_buckets
    bits = 0.0
    for i, w in enumerate(ws):
        pu = (uni.get(_wh(w) % n_buckets, 0) + 1) / denom
        if i == 0:
            p = pu
        else:
            cb = bi.get(_bi(ws[i - 1], w) % n_buckets, 0)
            cp = uni.get(_wh(ws[i - 1]) % n_buckets, 0)
            p = cb / cp if (cb > 0 and cp > 0) else _LM_BACKOFF * pu
        bits += -math.log2(p)
    return bits / len(ws)


def _ref_ds(repartition=None):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(REF_DOCS))),
        "text": pa.array(REF_DOCS)}))
    return ds.repartition(repartition) if repartition else ds


def test_train_matches_oracle_counts(ray_session):
    model = train_ngram_lm(_ref_ds(), n_buckets=NB)
    uni, bi, total = _oracle_model(REF_DOCS, NB)
    assert model["total"] == total
    assert {b: int(c) for b, c in enumerate(model["uni"]) if c} == uni
    assert {b: int(c) for b, c in enumerate(model["bi"]) if c} == bi


def test_train_partitioning_invariant(ray_session):
    a = train_ngram_lm(_ref_ds(), n_buckets=NB)
    b = train_ngram_lm(_ref_ds(repartition=5), n_buckets=NB)
    assert np.array_equal(a["uni"], b["uni"])
    assert np.array_equal(a["bi"], b["bi"])
    assert a["total"] == b["total"]


def test_score_matches_oracle(ray_session):
    model = train_ngram_lm(_ref_ds(), n_buckets=NB)
    uni, bi, total = _oracle_model(REF_DOCS, NB)
    got = _lm_bits_for_texts(CAND_DOCS, model)
    for i, doc in enumerate(CAND_DOCS):
        want = _oracle_bits(doc, uni, bi, total, NB)
        if math.isnan(want):
            assert math.isnan(got[i]), doc
        else:
            assert got[i] == pytest.approx(want, abs=1e-12), doc
    # the signal points the right way: in-distribution beats OOD
    assert got[0] < got[1]


def test_lm_score_stage(ray_session):
    model = train_ngram_lm(_ref_ds(), n_buckets=NB)
    cand = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CAND_DOCS))),
        "text": pa.array(CAND_DOCS)})).repartition(3)
    df = lm_score(cand, model).to_pandas().sort_values("doc_id")
    assert "lm_bits" in df.columns
    direct = _lm_bits_for_texts(CAND_DOCS, model)
    np.testing.assert_allclose(df["lm_bits"].to_numpy(), direct,
                               rtol=0, atol=1e-12)
