"""Unigram-LM tokenizer training and encoding (Kudo 2018, the
SentencePiece "unigram" algorithm) — the other half of the tokenizer
family next to BPE (functions/bpe.py).

Same scale split as BPE, but with the opposite inner loop: BPE's merge
loop is inherently sequential (each merge depends on the last) so it runs
driver-side over the bounded word histogram; unigram's inner loop is EM,
and the E-step is embarrassingly parallel over DISTINCT WORDS — so here
the corpus reduces to the (word, count) histogram once
(:func:`text.vocab_counts`, combiner-first), and every EM iteration is a
``map_batches`` pass over that histogram with the current piece
log-probabilities broadcast via ``ray.put``: each batch runs the
forward-backward lattice per distinct word and emits PRE-AGGREGATED
(piece, expected_count) partials, which one vocabulary-sized exchange
folds deterministically (hash-bucketed map_groups, values summed in
sorted order — float sums are order-sensitive, so the fold order is
pinned; the native groupby-sum would be partition-dependent at the
last ulp). EM runs a FIXED number of sub-iterations per pruning round
(SentencePiece's own protocol) — no data-dependent convergence branch, so
the whole trainer is a pure function of (histogram, knobs).

Seeding uses frequent substrings of the histogram (every substring up to
``max_piece_len``, counted with word multiplicity — integer counts, one
vocabulary-sized groupby-sum, bounded top-k without a global sort), which
is the practical stand-in for the suffix-array seeder; single characters
are always retained so every histogram word stays encodable. Pruning is
the published loss heuristic: drop the pieces whose removal costs the
least likelihood (count_i * (logp_i - viterbi_without_i)), computed
driver-side over the vocabulary-sized piece table.

Encoding is Viterbi best-segmentation per word, served by an actor pool
with a per-actor word cache (the BpeEncodeStage contract).

No reference counterpart (SURVEY.md §6 training-data family).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# per-word lattice kernels (distinct words only — never corpus rows)
# ---------------------------------------------------------------------------

def _viterbi(word: str, logp: dict, max_len: int):
    """Best segmentation of ``word`` into pieces. Returns (pieces, score);
    (None, -inf) if the word cannot be covered. Ties break toward FEWER,
    therefore longer, pieces (the j-descending scan keeps the earliest
    strictly-better split, and equal scores prefer the longest last piece
    — deterministic)."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == _NEG_INF:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i], back[i] = s, j
    if best[n] == _NEG_INF:
        return None, _NEG_INF
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1], best[n]


def _expected_counts(word: str, cnt: int, logp: dict, max_len: int,
                     out: dict) -> float:
    """Forward-backward over the segmentation lattice: adds
    ``cnt * P(piece used | word)`` into ``out`` per piece, returns
    ``cnt * log P(word)`` (0.0 and no contribution if uncoverable)."""
    n = len(word)
    alpha = np.full(n + 1, _NEG_INF)
    beta = np.full(n + 1, _NEG_INF)
    alpha[0] = 0.0
    spans = []  # (j, i, piece, lp)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None:
                spans.append((j, i, word[j:i], lp))
                if alpha[j] != _NEG_INF:
                    alpha[i] = np.logaddexp(alpha[i], alpha[j] + lp)
    if alpha[n] == _NEG_INF:
        return 0.0
    beta[n] = 0.0
    for i in range(n, 0, -1):
        if beta[i] == _NEG_INF:
            continue
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None:
                beta[j] = np.logaddexp(beta[j], beta[i] + lp)
    z = alpha[n]
    for j, i, piece, lp in spans:
        if alpha[j] == _NEG_INF or beta[i] == _NEG_INF:
            continue
        out[piece] = out.get(piece, 0.0) + cnt * math.exp(
            alpha[j] + lp + beta[i] - z)
    return cnt * z


# ---------------------------------------------------------------------------
# naive trainer (test oracle) — same algorithm, single dict, no Ray
# ---------------------------------------------------------------------------

def _seed_counts_naive(word_counts: dict, max_piece_len: int) -> dict:
    seeds: dict[str, float] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        n = len(w)
        for i in range(n):
            for L in range(1, min(max_piece_len, n - i) + 1):
                p = w[i:i + L]
                seeds[p] = seeds.get(p, 0) + c
    return seeds


def _top_seeds(seed_counts: dict, seed_size: int) -> dict:
    """Top ``seed_size`` substrings by (count DESC, piece ASC) PLUS all
    single characters (coverage guarantee)."""
    chars = {p for p in seed_counts if len(p) == 1}
    ranked = sorted(seed_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in ranked[:seed_size]} | chars
    return {p: seed_counts[p] for p in keep}


def _normalize(counts: dict) -> dict:
    """counts -> logp, folded over sorted pieces (deterministic sum)."""
    total = 0.0
    for p in sorted(counts):
        total += counts[p]
    return {p: math.log(counts[p] / total) for p in sorted(counts)
            if counts[p] > 0}


def _prune(logp: dict, counts: dict, keep_n: int) -> dict:
    """Keep the ``keep_n`` pieces whose removal would cost the most
    likelihood (plus all single characters). The published heuristic:
    loss_i = count_i * (logp_i - best-alternative-segmentation score)."""
    removable = []
    max_len = max((len(q) for q in logp), default=1)
    for p in list(logp):
        if len(p) == 1:
            continue
        c = counts.get(p, 0.0)
        lp_p = logp.pop(p)  # temporarily remove: alt = everything else
        _, alt_score = _viterbi(p, logp, max_len)
        logp[p] = lp_p
        if alt_score == _NEG_INF:
            removable.append((math.inf, p))  # irreplaceable — always keep
        else:
            removable.append((c * (lp_p - alt_score), p))
    removable.sort(key=lambda t: (-t[0], t[1]))
    chars = [p for p in logp if len(p) == 1]
    n_keep = max(0, keep_n - len(chars))
    kept = set(chars) | {p for _, p in removable[:n_keep]}
    return {p: logp[p] for p in sorted(kept)}


def _train_unigram_naive(word_counts: dict, vocab_size: int,
                         seed_size: int = 2000, max_piece_len: int = 8,
                         em_iters: int = 2, shrink: float = 0.75) -> dict:
    """Reference implementation (everything in one process) — the test
    oracle for :func:`train_unigram`; identical protocol, dict E-step."""
    seeds = _top_seeds(_seed_counts_naive(word_counts, max_piece_len),
                       seed_size)
    logp = _normalize(seeds)
    while True:
        for _ in range(em_iters):
            exp: dict[str, float] = {}
            for w, c in word_counts.items():
                if w:
                    _expected_counts(w, c, logp, max_piece_len, exp)
            logp = _normalize(exp)
        if len(logp) <= vocab_size:
            break
        target = max(vocab_size, int(len(logp) * shrink))
        exp = {}
        for w, c in word_counts.items():
            if w:
                _expected_counts(w, c, logp, max_piece_len, exp)
        logp = _prune(logp, exp, target)
    return _finalize(logp)


def _finalize(logp: dict) -> dict:
    """Model dict: pieces ordered by (score DESC, piece ASC) — id 0 is the
    most probable piece; deterministic."""
    order = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return {"pieces": [p for p, _ in order],
            "logps": [lp for _, lp in order]}


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

def _det_sum_partials(df) -> dict:
    """Fold float (piece, e_cnt) partial rows into per-piece sums,
    deterministically under ANY partitioning: sort by (piece, e_cnt) and
    fold in that order (float sums are order-sensitive). Returns a driver
    dict (vocabulary-sized)."""
    if df.empty:
        return {}
    df = df.sort_values(["piece", "e_cnt"], kind="mergesort")
    out = df.groupby("piece", sort=True)["e_cnt"].sum()
    return dict(zip(out.index, out.to_numpy()))


def _em_pass_distributed(hist_ds, logp: dict, max_piece_len: int) -> dict:
    """One distributed E-step over the (word, cnt) histogram Dataset:
    broadcast piece log-probs once, per-batch forward-backward over the
    batch's distinct words with batch-local pre-aggregation (combiner),
    then a deterministic fold of the vocabulary-sized partials."""
    import ray

    ref = ray.put(logp)

    def partial(batch: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        exp: dict[str, float] = {}
        for w, c in zip(batch.column("word").to_pylist(),
                        batch.column("cnt").to_pylist()):
            if w:
                _expected_counts(w, int(c), lp, max_piece_len, exp)
        pieces = sorted(exp)
        return pa.table({"piece": pa.array(pieces, pa.string()),
                         "e_cnt": pa.array([exp[p] for p in pieces],
                                           pa.float64())})

    parts = hist_ds.map_batches(partial, batch_format="pyarrow")
    # vocabulary-sized rows (n_batches x pieces-per-batch); the driver fold
    # is bounded by vocab x n_batches — the same envelope as build_vocab's
    # bounded partial merge
    return _det_sum_partials(parts.to_pandas())


def _seed_distributed(hist_ds, seed_size: int, max_piece_len: int) -> dict:
    """Distributed substring seeding: per-batch substring counts
    (integer, batch-local combiner) -> ONE groupby-sum -> bounded top-k
    by (count DESC, piece ASC) plus all single chars."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for w, c in zip(batch.column("word").to_pylist(),
                        batch.column("cnt").to_pylist()):
            if not w:
                continue
            c = int(c)
            n = len(w)
            for i in range(n):
                for L in range(1, min(max_piece_len, n - i) + 1):
                    p = w[i:i + L]
                    acc[p] = acc.get(p, 0) + c
        ks = sorted(acc)
        return pa.table({"piece": pa.array(ks, pa.string()),
                         "cnt": pa.array([acc[k] for k in ks], pa.int64())})

    counted = (hist_ds.map_batches(partial, batch_format="pyarrow")
               .groupby("piece").aggregate(Sum("cnt", alias_name="cnt")))

    def topk(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.to_pandas()
        head = df.sort_values(["cnt", "piece"], ascending=[False, True],
                              kind="mergesort").head(seed_size)
        chars = df[df["piece"].str.len() == 1]
        return pa.Table.from_pandas(
            pd.concat([head, chars]).drop_duplicates("piece"),
            preserve_index=False)

    merged = (counted.map_batches(topk, batch_format="pyarrow")
              .to_pandas())
    return _top_seeds(dict(zip(merged["piece"], merged["cnt"])), seed_size)


def train_unigram(ds, vocab_size: int, col: str = "text",
                  max_words: int = 100_000, seed_size: int = 2000,
                  max_piece_len: int = 8, em_iters: int = 2,
                  shrink: float = 0.75) -> dict:
    """Train a unigram-LM tokenizer on a Dataset. Corpus -> bounded
    (word, cnt) histogram once (:func:`text.build_vocab` order), then
    alternating distributed-EM / driver-prune rounds until ``vocab_size``.
    Returns ``{"pieces": [...], "logps": [...], "n_words": N}`` with ids
    in (score DESC, piece ASC) order."""
    import ray.data
    from .text import build_vocab

    hist = build_vocab(ds, size=max_words, col=col)
    n_words = hist.num_rows
    hist_ds = ray.data.from_arrow(hist.select(["word", "cnt"]))

    logp = _normalize(_seed_distributed(hist_ds, seed_size, max_piece_len))
    while True:
        for _ in range(em_iters):
            logp = _normalize(
                _em_pass_distributed(hist_ds, logp, max_piece_len))
        if len(logp) <= vocab_size:
            break
        target = max(vocab_size, int(len(logp) * shrink))
        counts = _em_pass_distributed(hist_ds, logp, max_piece_len)
        logp = _prune(logp, counts, target)
    model = _finalize(logp)
    model["n_words"] = n_words
    return model


# ---------------------------------------------------------------------------
# encoding (Viterbi, actor pool — the BpeEncodeStage contract)
# ---------------------------------------------------------------------------

class UnigramEncodeStage:
    """Actor stage: piece table built once per actor, per-actor bounded
    word->ids cache (see BpeEncodeStage for the bound rationale). Appends
    ``uni_ids`` (list<int32>; a word with uncoverable characters encodes
    as [-1]) and ``uni_len``."""

    def __init__(self, model_ref, col: str = "text",
                 cache_max: int = 1 << 20):
        import ray

        model = (ray.get(model_ref)
                 if not isinstance(model_ref, dict) else model_ref)
        self.logp = dict(zip(model["pieces"], model["logps"]))
        self.ids = {p: i for i, p in enumerate(model["pieces"])}
        self.max_len = max((len(p) for p in self.logp), default=1)
        self.col = col
        self.cache_max = cache_max
        self.cache: dict[str, list[int]] = {}

    def _word_ids(self, word: str) -> list[int]:
        got = self.cache.get(word)
        if got is None:
            if len(self.cache) >= self.cache_max:
                self.cache.clear()
            pieces, _ = _viterbi(word, self.logp, self.max_len)
            got = ([-1] if pieces is None
                   else [self.ids[p] for p in pieces])
            self.cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(batch.column(self.col).to_pylist(), dtype=object)
        split = s.fillna("").astype(str).str.lower().str.split()
        ids_col, len_col = [], []
        for words in split:
            ids: list[int] = []
            for w in words:
                ids.extend(self._word_ids(w))
            ids_col.append(ids)
            len_col.append(len(ids))
        return (batch.append_column(
                    "uni_ids", pa.array(ids_col, pa.list_(pa.int32())))
                     .append_column("uni_len",
                                    pa.array(len_col, pa.int64())))


def unigram_encode(ds, model: dict, col: str = "text"):
    """Append ``uni_ids``/``uni_len`` to every row (broadcast model,
    actor pool with per-actor word cache)."""
    import ray

    mref = ray.put({"pieces": model["pieces"], "logps": model["logps"]})
    return ds.map_batches(UnigramEncodeStage,
                          fn_constructor_kwargs=dict(model_ref=mref,
                                                     col=col),
                          batch_format="pyarrow", concurrency=_pool())


def _pool():
    from .pool import actor_pool
    return actor_pool()
