"""BPE trainer/encoder — hand-computed merges + encode invariants."""

import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.bpe import (
    EOW,
    BpeEncodeStage,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_from_counts,
)

# the Sennrich et al. (2016) worked example
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_loop_matches_hand_computation():
    model = train_bpe_from_counts(SENNRICH, n_merges=4)
    # pair mass: ('e','s') 9, ('s','t') 9, ('t','</w>') 9 ... tie at 9 breaks
    # lexicographically: ('e','s') first, then ('es','t'), then ('est','</w>'),
    # then ('l','o') (7)
    assert model["merges"] == [("e", "s"), ("es", "t"), ("est", EOW),
                               ("l", "o")]
    assert "est" + EOW in model["vocab"]
    base = {c for w in SENNRICH for c in w} | {EOW}
    assert set(model["vocab"]) == base | {"es", "est", "est" + EOW, "lo"}


def test_encode_word_greedy_and_oov():
    model = train_bpe_from_counts(SENNRICH, n_merges=4)
    ranks = {p: i for i, p in enumerate(model["merges"])}
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + EOW]
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    # zero merges -> raw chars + EOW
    assert encode_word("low", {}) == ["l", "o", "w", EOW]
    # decode property: concatenation restores the word + EOW
    for w in ("low", "lowest", "widest", "xyzzy"):
        assert "".join(encode_word(w, ranks)) == w + EOW


def test_train_bpe_distributed_histogram(ray_session):
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    model = train_bpe(ds, n_merges=4)
    assert model["merges"] == [("e", "s"), ("es", "t"), ("est", EOW),
                               ("l", "o")]
    assert model["n_words"] == 4


def test_bpe_encode_stage(ray_session):
    model = train_bpe_from_counts(SENNRICH, n_merges=4)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2]),
        "text": pa.array(["low lowest", "newest newest", ""])}))
    df = bpe_encode(ds, model).to_pandas().sort_values("doc_id")
    ids = {s: i for i, s in enumerate(model["vocab"])}
    want0 = [ids["lo"], ids["w"], ids[EOW],
             ids["lo"], ids["w"], ids["est" + EOW]]
    assert list(df["bpe_ids"].iloc[0]) == want0
    assert df["bpe_len"].tolist() == [6, 8, 0]
    # OOV symbols map to -1, never crash
    oov = bpe_encode(ray.data.from_arrow(pa.table({
        "text": pa.array(["qqq"])})), model).to_pandas()
    assert -1 in oov["bpe_ids"].iloc[0]


def test_encode_cache_consistency():
    model = train_bpe_from_counts(SENNRICH, n_merges=4)
    stage = BpeEncodeStage(
        {"merges": model["merges"], "vocab": model["vocab"]})
    a = stage._word_ids("lowest")
    b = stage._word_ids("lowest")  # cached path
    assert a == b and a is b


def test_incremental_trainer_equals_naive_oracle():
    import random

    from brdrq_ray.functions.bpe import _train_bpe_naive

    rng = random.Random(13)
    alphabet = "abcde"
    for trial in range(6):
        counts = {}
        for _ in range(60):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 7)))
            counts[w] = counts.get(w, 0) + rng.randint(1, 9)
        for n in (5, 20, 100):
            fast = train_bpe_from_counts(counts, n)
            slow = _train_bpe_naive(counts, n)
            assert fast["merges"] == slow["merges"], (trial, n)
            assert fast["vocab"] == slow["vocab"], (trial, n)
