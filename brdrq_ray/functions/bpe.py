"""BPE tokenizer training and encoding (Sennrich et al. 2016).

The corpus-sized half is distributed, the vocabulary-sized half is not —
which is exactly how production BPE trainers work: merges are learned from
the WORD HISTOGRAM, never the raw corpus, so the engine reduces the corpus
to (word, count) rows with :func:`text.vocab_counts` (pre-aggregated
per-batch counts, one vocabulary-sized groupby-sum) and runs the classic
merge loop driver-side over the bounded histogram (``max_words`` caps it;
the rare-word tail it drops contributes negligible pair mass — standard
practice). Every step is deterministic: ties in pair frequency break
lexicographically, histogram truncation by (count DESC, word ASC).

Encoding streams: an actor pool holds the merge-rank table (built once per
actor) and a per-actor word->tokens cache, so each UNIQUE word per batch is
encoded once however often it repeats — the factorize trick that makes a
per-word Python loop acceptable in the hot path (tokens/unique-word, not
tokens/occurrence; a Zipfian batch hits the cache for almost every token).

No reference counterpart (SURVEY.md §6 training-data family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EOW = "</w>"  # end-of-word marker (closed-vocabulary word boundary)


def _pair_counts(words: dict[tuple, int]) -> dict[tuple, int]:
    pairs: dict[tuple, int] = {}
    for syms, cnt in words.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + cnt
    return pairs


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_bpe_naive(word_counts: dict[str, int], n_merges: int) -> dict:
    """Reference implementation (recount every pair each round) — kept as
    the test oracle for the incremental trainer below."""
    words = {tuple(w) + (EOW,): c for w, c in word_counts.items() if w}
    base = sorted({s for syms in words for s in syms})
    merges: list[tuple] = []
    for _ in range(n_merges):
        pairs = _pair_counts(words)
        if not pairs:
            break
        # deterministic argmax: count DESC, pair lexicographic ASC
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {_merge_word(syms, best): c for syms, c in words.items()}
    vocab = base + [a + b for a, b in merges]
    return {"merges": merges, "vocab": vocab}


def train_bpe_from_counts(word_counts: dict[str, int],
                          n_merges: int) -> dict:
    """The merge loop over a word->count dict (driver-side, vocabulary-
    sized), with the standard incremental bookkeeping: a pair->count table
    and pair->word index updated only for the words a merge touches, and a
    lazy max-heap keyed (-count, pair) so each round pops the current best
    instead of rescanning every pair (stale heap entries are skipped when
    their recorded count no longer matches). Merge sequence is IDENTICAL to
    the naive recount (same (count DESC, pair ASC) argmax — pinned by
    test_bpe). Returns {'merges': [(a, b), ...], 'vocab': [...]} with
    vocab = sorted base symbols + merged symbols in merge order."""
    import heapq

    syms_list: list[list] = []
    cnts: list[int] = []
    for w, c in word_counts.items():
        if w:
            syms_list.append(list(w) + [EOW])
            cnts.append(c)
    base = sorted({s for syms in syms_list for s in syms})

    pair_cnt: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for wi, syms in enumerate(syms_list):
        c = cnts[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_cnt[p] = pair_cnt.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_cnt.items()]
    heapq.heapify(heap)

    def bump(p: tuple, delta: int, wi: int):
        cur = pair_cnt.get(p, 0) + delta
        if cur <= 0:
            pair_cnt.pop(p, None)
        else:
            pair_cnt[p] = cur
            # push on EVERY surviving update, decrements included — a pair
            # whose count only ever falls must still be findable at its new
            # count once the stale higher entries are skipped
            heapq.heappush(heap, (-cur, p))
        if delta > 0:
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_cnt.get(best, 0) != -negc:
            continue  # stale entry
        merges.append(best)
        touched = pair_words.pop(best, set())
        for wi in sorted(touched):
            syms = syms_list[wi]
            c = cnts[wi]
            # retire the word's old adjacencies, merge, add the new ones
            for i in range(len(syms) - 1):
                bump((syms[i], syms[i + 1]), -c, wi)
            merged = _merge_word(tuple(syms), best)
            syms_list[wi] = list(merged)
            for i in range(len(merged) - 1):
                bump((merged[i], merged[i + 1]), c, wi)
        pair_cnt.pop(best, None)
    vocab = base + [a + b for a, b in merges]
    return {"merges": merges, "vocab": vocab}


def train_bpe(ds, n_merges: int, col: str = "text",
              max_words: int = 100_000) -> dict:
    """Train BPE merges on a Dataset: distributed word histogram
    (:func:`text.build_vocab` — bounded to the top ``max_words`` by
    (count DESC, word ASC)), then the driver-side merge loop. Returns the
    model dict of :func:`train_bpe_from_counts` plus the histogram size."""
    from .text import build_vocab

    hist = build_vocab(ds, size=max_words, col=col)
    counts = dict(zip(hist.column("word").to_pylist(),
                      hist.column("cnt").to_pylist()))
    model = train_bpe_from_counts(counts, n_merges)
    model["n_words"] = len(counts)
    return model


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the lowest-rank
    adjacent pair (the standard decoder-equivalent order)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """Actor stage: merge ranks + token-id table built once per actor, with
    a persistent word->ids cache across batches. Appends ``bpe_ids``
    (list<int32>, -1 for out-of-vocab symbols) and ``bpe_len``.

    The cache is BOUNDED (``cache_max`` entries, default 2^20): a heavy-
    tailed web vocabulary (URLs, hashes, typos) grows distinct words roughly
    linearly with corpus size, so an unbounded dict would OOM the actor.
    On overflow the cache resets wholesale — the Zipfian head repopulates
    within a batch, so the steady-state hit rate barely moves."""

    def __init__(self, model_ref, col: str = "text",
                 cache_max: int = 1 << 20):
        import ray

        model = (ray.get(model_ref)
                 if not isinstance(model_ref, dict) else model_ref)
        self.ranks = {p: i for i, p in enumerate(model["merges"])}
        self.ids = {s: i for i, s in enumerate(model["vocab"])}
        self.col = col
        self.cache_max = cache_max
        self.cache: dict[str, list[int]] = {}

    def _word_ids(self, word: str) -> list[int]:
        got = self.cache.get(word)
        if got is None:
            if len(self.cache) >= self.cache_max:
                self.cache.clear()
            got = [self.ids.get(s, -1) for s in encode_word(word, self.ranks)]
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
                    "bpe_ids", pa.array(ids_col, pa.list_(pa.int32())))
                     .append_column("bpe_len",
                                    pa.array(len_col, pa.int64())))


def bpe_encode(ds, model: dict, col: str = "text"):
    """Append ``bpe_ids``/``bpe_len`` to every row (broadcast model,
    actor pool with per-actor word cache)."""
    import ray

    mref = ray.put({"merges": model["merges"], "vocab": model["vocab"]})
    return ds.map_batches(BpeEncodeStage,
                          fn_constructor_kwargs=dict(model_ref=mref, col=col),
                          batch_format="pyarrow", concurrency=_pool())

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()
