"""Unigram-LM tokenizer (functions/unigram.py): lattice kernels vs
enumeration oracles, distributed trainer vs the naive oracle, Viterbi
encoding contract."""

import math

import numpy as np
import pytest

import ray.data

from brdrq_ray.functions.unigram import (_expected_counts, _normalize,
                                         _train_unigram_naive, _viterbi,
                                         train_unigram, unigram_encode)

WC = {"unbelievable": 10, "unbreakable": 8, "believable": 6,
      "breakable": 5, "unable": 7, "able": 9, "belief": 4, "break": 6}


def _docs_from_counts(wc, n_rows=6):
    """Documents whose vocab_counts histogram is exactly ``wc``, spread
    over several rows (and later, blocks)."""
    words = [w for w, c in sorted(wc.items()) for _ in range(c)]
    rows = [{"doc_id": i, "text": " ".join(words[i::n_rows])}
            for i in range(n_rows)]
    return rows


# ---------------------------------------------------------------------------
# lattice kernels vs enumeration
# ---------------------------------------------------------------------------

def _enum_expected(word, cnt, logp, max_len):
    segs = []

    def rec(i, cur):
        if i == len(word):
            segs.append(list(cur))
            return
        for L in range(1, min(max_len, len(word) - i) + 1):
            p = word[i:i + L]
            if p in logp:
                cur.append(p)
                rec(i + L, cur)
                cur.pop()

    rec(0, [])
    if not segs:
        return {}, 0.0
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(probs)
    out = {}
    for s, pr in zip(segs, probs):
        for p in s:
            out[p] = out.get(p, 0.0) + cnt * pr / z
    return out, cnt * math.log(z)


def test_forward_backward_matches_enumeration():
    logp = _normalize({"a": 5, "b": 3, "ab": 4, "ba": 2, "aba": 1})
    for word in ["abab", "aab", "ba", "ababa", "aaaa"]:
        got = {}
        ll = _expected_counts(word, 3, logp, 3, got)
        want, ll_want = _enum_expected(word, 3, logp, 3)
        assert set(got) == set(want)
        for p in got:
            assert got[p] == pytest.approx(want[p], abs=1e-10)
        assert ll == pytest.approx(ll_want, abs=1e-10)


def test_viterbi_matches_brute_force():
    logp = _normalize({"a": 5, "b": 3, "ab": 4, "ba": 2, "aba": 1})

    def best(word, max_len):
        out, sc = None, -math.inf

        def rec(i, cur, s):
            nonlocal out, sc
            if i == len(word):
                if s > sc:
                    sc, out = s, list(cur)
                return
            for L in range(1, min(max_len, len(word) - i) + 1):
                p = word[i:i + L]
                if p in logp:
                    cur.append(p)
                    rec(i + L, cur, s + logp[p])
                    cur.pop()

        rec(0, [], 0.0)
        return out, sc

    for word in ["abab", "aab", "ababa", "bb", "aaaaab"]:
        pieces, sc = _viterbi(word, logp, 3)
        _, sc_bf = best(word, 3)
        assert sc == pytest.approx(sc_bf, abs=1e-12)
        assert "".join(pieces) == word
    # uncoverable word (no 'c' piece)
    pieces, sc = _viterbi("abc", logp, 3)
    assert pieces is None and sc == -math.inf


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def test_naive_trainer_learns_morphemes():
    m = _train_unigram_naive(WC, vocab_size=20, seed_size=200,
                             max_piece_len=6)
    assert len(m["pieces"]) <= 20
    assert {"able", "un", "break"} <= set(m["pieces"])
    # id order: (score DESC, piece ASC)
    assert m["logps"] == sorted(m["logps"], reverse=True)


def test_distributed_trainer_matches_naive(ray_session):
    ds = ray.data.from_items(_docs_from_counts(WC))
    model = train_unigram(ds, vocab_size=20, seed_size=200,
                          max_piece_len=6, max_words=1000)
    oracle = _train_unigram_naive(WC, vocab_size=20, seed_size=200,
                                  max_piece_len=6)
    assert model["pieces"] == oracle["pieces"]
    np.testing.assert_allclose(model["logps"], oracle["logps"], rtol=1e-9)
    assert model["n_words"] == len(WC)


def test_distributed_trainer_partition_invariant(ray_session):
    models = []
    for parts in (1, 4):
        ds = ray.data.from_items(_docs_from_counts(WC)).repartition(parts)
        models.append(train_unigram(ds, vocab_size=20, seed_size=200,
                                    max_piece_len=6, max_words=1000))
    assert models[0]["pieces"] == models[1]["pieces"]
    np.testing.assert_allclose(models[0]["logps"], models[1]["logps"],
                               rtol=1e-9)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def test_unigram_encode_roundtrip(ray_session):
    model = _train_unigram_naive(WC, vocab_size=20, seed_size=200,
                                 max_piece_len=6)
    rows = [{"doc_id": 0, "text": "unbreakable able BREAK"},
            {"doc_id": 1, "text": "unbelievable belief"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "zzz able"}]  # 'z' not in any piece
    out = (unigram_encode(ray.data.from_items(rows), model)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pieces = model["pieces"]

    def decode(ids):
        return "".join(pieces[i] for i in ids if i >= 0)

    assert decode(out["uni_ids"][0]) == "unbreakableablebreak"  # lowercased
    assert decode(out["uni_ids"][1]) == "unbelievablebelief"
    assert list(out["uni_ids"][2]) == [] and out["uni_len"][2] == 0
    # uncoverable word -> single -1, rest still encoded
    ids3 = list(out["uni_ids"][3])
    assert ids3[0] == -1 and decode(ids3[1:]) == "able"
    assert (out["uni_len"] == [len(list(v)) for v in out["uni_ids"]]).all()
