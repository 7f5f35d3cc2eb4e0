"""GPT-style fixed-length chunking (functions/packing.py) vs a brute-force
pandas oracle: concat token ids (+EOS) in (hash60 ASC, id ASC) order, slice
every seq_len tokens."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.packing import chunk_fixed_length
from brdrq_ray.functions.sampling import hash60


def _corpus(n=60, seed=4, max_len=37):
    rng = np.random.default_rng(seed)
    ids = [f"d{i:04d}" for i in range(n)]
    toks = [rng.integers(0, 1000, size=int(rng.integers(0, max_len))).astype(np.int32).tolist()
            for _ in range(n)]
    return pd.DataFrame({"doc_id": ids, "bpe_ids": toks})


def _ds(df):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(df.doc_id.tolist(), pa.string()),
        "bpe_ids": pa.array(df.bpe_ids.tolist(), pa.list_(pa.int32())),
    }))


def _brute(df, seq_len, eos_id=None, seed="chunk", drop_last=True, pad_id=None):
    d2 = df.copy()
    d2["h"] = hash60(d2.doc_id.tolist(), seed)
    d2 = d2.sort_values(["h", "doc_id"], kind="mergesort")
    stream = []
    for t in d2.bpe_ids:
        stream.extend(t)
        if eos_id is not None:
            stream.append(eos_id)
    chunks = []
    for s in range(0, len(stream) - (seq_len - 1), seq_len):
        chunks.append(stream[s:s + seq_len])
    rem = len(stream) % seq_len
    if rem and not drop_last:
        chunks.append(stream[len(stream) - rem:] + [pad_id] * (seq_len - rem))
    return chunks


def _got(ds, **kw):
    out = chunk_fixed_length(ds, **kw).to_pandas()
    out = out.sort_values("chunk_id").reset_index(drop=True)
    return [list(x) for x in out.input_ids]


def test_chunks_match_brute_force(ray_session):
    df = _corpus()
    want = _brute(df, 64, eos_id=0)
    got = _got(_ds(df), seq_len=64, eos_id=0)
    assert got == want
    assert all(len(c) == 64 for c in got)


def test_partition_and_bucket_invariance(ray_session):
    df = _corpus(n=80, seed=8)
    want = _brute(df, 32, eos_id=0)
    a = _got(_ds(df).repartition(7), seq_len=32, eos_id=0)
    b = _got(_ds(df), seq_len=32, eos_id=0, n_buckets=4)
    c = _got(_ds(df), seq_len=32, eos_id=0, n_buckets=64)
    assert a == want and b == want and c == want


def test_no_eos_and_pad_last(ray_session):
    df = _corpus(n=25, seed=2)
    want = _brute(df, 50, eos_id=None, drop_last=False, pad_id=-1)
    got = _got(_ds(df), seq_len=50, eos_id=None, drop_last=False, pad_id=-1)
    assert got == want
    # total token conservation: sum lens == full chunks + padded tail content
    total = int(sum(len(t) for t in df.bpe_ids))
    n_real = sum(1 for c in got for v in c if v != -1)
    # -1 never occurs in the corpus (tokens are >= 0), so this is exact
    assert n_real == total


def test_epoch_seed_changes_order_not_content(ray_session):
    # pad mode so the multiset comparison sees the whole stream (drop_last
    # would drop a DIFFERENT tail per epoch order)
    df = _corpus(n=40, seed=6)
    a = _got(_ds(df), seq_len=16, eos_id=0, seed="ep0",
             drop_last=False, pad_id=-1)
    b = _got(_ds(df), seq_len=16, eos_id=0, seed="ep1",
             drop_last=False, pad_id=-1)
    assert a != b                       # different corpus order
    sa = [v for c in a for v in c if v != -1]
    sb = [v for c in b for v in c if v != -1]
    assert sorted(sa) == sorted(sb)


def test_validation(ray_session):
    df = _corpus(n=3)
    with pytest.raises(ValueError, match="seq_len"):
        chunk_fixed_length(_ds(df), 0)
    with pytest.raises(ValueError, match="pad_id"):
        chunk_fixed_length(_ds(df), 8, drop_last=False)


def test_composes_with_bpe(ray_session):
    from brdrq_ray.functions.bpe import bpe_encode, train_bpe
    docs = ray.data.from_items([
        {"doc_id": f"x{i}", "text": "low lower lowest newer newest " * (i + 1)}
        for i in range(6)])
    model = train_bpe(docs, n_merges=30)
    enc = bpe_encode(docs, model)
    out = chunk_fixed_length(enc, seq_len=24,
                             eos_id=len(model["vocab"])).to_pandas()
    assert len(out) >= 1
    assert all(len(x) == 24 for x in out.input_ids)
