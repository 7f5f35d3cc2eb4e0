"""DSIR importance resampling — brute-force oracle tests.

Weights are pinned to a per-doc dict-model oracle; the resample is pinned to
an exact driver-side Gumbel-top-k over the same keys, across partitionings.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.sampling import (
    dsir_log_weights,
    dsir_resample,
    gumbel_keys,
    hash60,
)
from brdrq_ray.functions.text import train_ngram_lm

from .test_ngram_lm import NB, _bi, _oracle_model, _wh

TARGET_DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog sat",
]
RAW_DOCS = [
    "the cat sat on the mat",        # looks like target
    "a dog and a cat sat on a log",  # looks like target
    "zebra quark flux entropy gauge boson",
    "lorem ipsum dolor sit amet",
    "the stock market fell sharply today",
    "cat dog cat dog cat dog",
    "",                              # empty: weight 0
    "the",                           # single token
]


def _models(ray_session=None):
    t = ray.data.from_arrow(pa.table({"text": pa.array(TARGET_DOCS)}))
    r = ray.data.from_arrow(pa.table({"text": pa.array(RAW_DOCS)}))
    return (train_ngram_lm(t, n_buckets=NB),
            train_ngram_lm(r, n_buckets=NB))


def _oracle_logw(doc, t_model, r_model):
    t_uni, t_bi, t_tot = _oracle_model(TARGET_DOCS, NB)
    r_uni, r_bi, r_tot = _oracle_model(RAW_DOCS, NB)
    t_bi_tot, r_bi_tot = sum(t_bi.values()), sum(r_bi.values())

    def lr(cnts_t, tot_t, cnts_r, tot_r, b):
        return (math.log(cnts_t.get(b, 0) + 1) - math.log(tot_t + NB)
                - math.log(cnts_r.get(b, 0) + 1) + math.log(tot_r + NB))

    ws = doc.lower().split()
    w = 0.0
    for word in ws:
        w += lr(t_uni, t_tot, r_uni, r_tot, _wh(word) % NB)
    for a, b in zip(ws, ws[1:]):
        w += lr(t_bi, t_bi_tot, r_bi, r_bi_tot, _bi(a, b) % NB)
    return w


def _raw_ds(repartition=None):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"r{i}" for i in range(len(RAW_DOCS))]),
        "text": pa.array(RAW_DOCS)}))
    return ds.repartition(repartition) if repartition else ds


def test_weights_match_oracle(ray_session):
    t_model, r_model = _models()
    df = (dsir_log_weights(_raw_ds(3), t_model, r_model)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, doc in enumerate(RAW_DOCS):
        want = _oracle_logw(doc, t_model, r_model)
        assert df["dsir_logw"][i] == pytest.approx(want, abs=1e-9), doc
    # empty doc scores exactly 0
    assert df["dsir_logw"][6] == 0.0
    # target-looking docs outweigh OOD docs
    assert df["dsir_logw"][0] > df["dsir_logw"][2]
    assert df["dsir_logw"][1] > df["dsir_logw"][3]


def test_resample_equals_gumbel_topk(ray_session):
    t_model, r_model = _models()
    wdf = (dsir_log_weights(_raw_ds(), t_model, r_model)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    keys = gumbel_keys(wdf["doc_id"].tolist(),
                       wdf["dsir_logw"].to_numpy(), "dsir")
    h = hash60(wdf["doc_id"].tolist(), "dsir")
    order = sorted(range(len(keys)),
                   key=lambda i: (-keys[i], h[i], wdf["doc_id"][i]))
    for k in (1, 3, 5, len(RAW_DOCS)):
        want = {wdf["doc_id"][i] for i in order[:k]}
        for parts in (None, 5):
            got = dsir_resample(_raw_ds(parts), t_model, r_model, k=k)
            assert set(got.to_pandas()["doc_id"]) == want, (k, parts)


def test_resample_fraction_and_validation(ray_session):
    t_model, r_model = _models()
    got = dsir_resample(_raw_ds(), t_model, r_model, fraction=0.5)
    assert got.count() == round(0.5 * len(RAW_DOCS))
    df = got.to_pandas()
    # helper columns dropped, weight kept for auditing
    assert "__dsir_key" not in df.columns and "__one" not in df.columns
    assert "dsir_logw" in df.columns
    with pytest.raises(ValueError):
        dsir_resample(_raw_ds(), t_model, r_model)
    with pytest.raises(ValueError):
        dsir_resample(_raw_ds(), t_model, r_model, k=2, fraction=0.1)
