"""End-to-end training-corpus curation pipeline.

Composes the LLM-data operators into ONE streaming Dataset DAG — the shape a
100 TB pretraining-data run actually executes, and the proof that the
operator family composes (each stage is individually driver/oracle-gated;
this module is about the glue):

    read -> [boilerplate-line removal]                          [opt-in]
         -> [repeated-passage excision (cross-doc k-grams)]     [opt-in]
         -> annotate (quality score, language ID, token count,
                      [n-gram-LM bits/token vs a reference],
                      [LR quality-classifier probability])      [opt-in]
         -> filter (quality floor, language allowlist,
                    [repetition-ratio ceiling], [LM-bits cap],
                    [classifier cap / deterministic Pareto draw]) [per-row]
         -> [13-gram benchmark decontamination]                 [opt-in]
         -> exact dedup (content-hash bucket shuffle, min-id)   [1 shuffle]
         -> near-dup removal (MinHash-LSH -> clusters -> anti-  [sketch-table
            join losers out; keep the min-id representative)     shuffles only]
         -> [SemDeDup semantic dedup over an embedding table]   [opt-in]
         -> [DSIR resample toward a target-domain corpus]       [opt-in]
         -> deterministic Bernoulli downsample                  [per-row]
         -> [UniMax domain-balanced budget cut]                 [opt-in]
         -> [token-budget best-docs cut (exact sort-prefix)]    [opt-in]
         -> greedy sequence packing (bucketed)                  [1 shuffle]

``curate_documents_with_report`` runs the same chain in audit mode: a
checkpoint after every enabled stage records the retention funnel (rows,
chars, ws_tokens, kept_frac, wall_s) without changing the output.

Scale notes:
- Everything streams except ONE deliberate pipeline checkpoint: the curated
  corpus is pinned (spill-backed materialize; at 100 TB: a parquet
  checkpoint) before the near-dup stage, because near-dup consumes its
  input three times (sketch, candidate-text fetch, anti-join) and a lazy
  input would re-execute the annotate/filter/dedup upstream per consumer.
  The only full-corpus exchanges are exact dedup's hash-bucket groupby and
  the pack's bucket groupby; near-dup only shuffles the MinHash band/sketch
  table and the loser-id set (functions/dedup.py docstrings).
- Near-dup losers are removed with the distributed tagged-union anti-join
  (functions/relational.py::semi_join(anti=True)) — the loser set never
  lands on the driver, so a 50%-duplicate web crawl works the same as a
  clean corpus.
- Every stage is a deterministic pure function of its input (+ the seed),
  so a re-run — or a re-run of ONE failed shard — reproduces the same
  curated corpus (the sampling contract, functions/sampling.py).

No reference counterpart (brdrQ aligns borders); this is the
training-data-engine half of the north rule's scope.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


@dataclass
class CurationConfig:
    col: str = "text"
    id_col: str = "doc_id"
    quality_min: float = 0.30
    languages: tuple | None = None        # e.g. ("en", "nl"); None = keep all
    near_dup: bool = True
    jaccard_threshold: float = 0.7
    near_dup_keep: str = "min_id"         # or "best_quality" (argmax score)
    sample_fraction: float | None = None  # None = keep everything
    seed: str = "curate"
    # near-dup knobs pass through to minhash_lsh_pairs
    minhash_kwargs: dict = field(default_factory=dict)
    # exact near-dup pair source: route through the recall-1.0 prefix-
    # filtered jaccard join instead of MinHash-LSH candidates (same verify,
    # same threshold; pays the document-frequency pass for zero missed
    # pairs — minhash_kwargs is then unused)
    near_dup_exact: bool = False
    # optional stages (None = stage off)
    boilerplate_min_docs: int | None = None   # C4 frequent-line removal
    passage_k: int | None = None              # repeated-passage excision k
    passage_min_docs: int = 2                 # ...across this many docs
    repetition_max: float | None = None       # drop docs above this ratio
    benchmark: object | None = None           # Dataset -> 13-gram decontam
    decontam_shingle_k: int = 13
    token_budget_total: int | None = None     # keep best docs until budget
    # UniMax domain-balanced budget (Chung et al. 2023): waterfill the total
    # over per-domain token counts, select each domain's share in
    # deterministic hash order (sampling.unimax_select)
    unimax_budget_total: int | None = None
    unimax_domain_col: str = "source"
    unimax_max_epochs: float = 1.0
    # hashed n-gram LM quality gate (CCNet-style): train on lm_reference,
    # drop docs scoring above lm_max_bits cross-entropy bits/token
    lm_reference: object | None = None        # Dataset of trusted text
    lm_max_bits: float | None = None
    lm_n_buckets: int = 1 << 20
    # SemDeDup semantic near-dup removal over a per-doc embedding table
    # (keyed by id_col; rename upstream if the source uses another key)
    embeddings: object | None = None          # Dataset (id_col, embedding)
    semantic_threshold: float | None = None   # cosine; None = stage off
    embedding_col: str = "embedding"
    # no embeddings table? set embed_dim to sketch one from the text itself
    # (hashed n-gram count-sketch, functions/embed — deterministic, no model)
    embed_dim: int | None = None
    embed_k: int = 3
    embed_seed: int = 0
    # extra knobs for semantic_dedup_keep_ids (n_clusters, train_sample, ...)
    semantic_kwargs: dict = field(default_factory=dict)
    # DSIR: resample k docs (or a fraction) toward dsir_target's distribution
    dsir_target: object | None = None         # Dataset of target-domain text
    dsir_k: int | None = None
    dsir_fraction: float | None = None
    # logistic-regression quality classifier (GPT-3-style): train on
    # clf_positive vs clf_negative, then either hard-cap (clf_min_prob) or
    # Pareto-sample (clf_pareto_alpha: keep iff pareto(alpha) > 1 - prob,
    # deterministic via hash60(seed|id) — the paper's np.random.pareto(9)
    # rule made reproducible)
    clf_positive: object | None = None
    clf_negative: object | None = None
    clf_min_prob: float | None = None
    clf_pareto_alpha: float | None = None
    clf_n_buckets: int = 1 << 16
    clf_epochs: int = 30
    # within-doc repeated-line removal (Dolma rule): keep each line's first
    # occurrence inside a doc; runs with the other text rewrites, pre-annotate
    dedup_lines: bool = False
    # C4 line/page cleaning (Raffel et al. 2020): rewrite text by the line
    # rules, drop pages failing the page rules; runs FIRST (before
    # boilerplate/annotation — everything downstream sees cleaned text)
    c4: bool = False
    c4_kwargs: dict = field(default_factory=dict)
    # Gopher quality rules (Rae et al. 2021): drop docs failing any rule;
    # gopher_kwargs overrides individual published thresholds
    gopher: bool = False
    gopher_kwargs: dict = field(default_factory=dict)
    # zlib compressibility gate: drop docs outside [min, max] ratio
    # (too compressible = templated/repetitive, too incompressible = noise)
    compression_min: float | None = None
    compression_max: float | None = None
    # media-payload dedup for curate_interleaved: a (media_ref, payload)
    # Dataset; duplicate payloads are canonicalized before curation
    media: object | None = None
    media_kwargs: dict = field(default_factory=dict)


def annotate_documents(ds: ray.data.Dataset, cfg: CurationConfig) -> ray.data.Dataset:
    """Quality features + language ID + whitespace token count as columns.
    Vectorized batch fns; LangId is an actor pool (profiles built per actor)."""
    from ..functions.text import LangIdStage, quality_score_batch, token_count_batch

    ds = ds.map_batches(lambda b: quality_score_batch(b, col=cfg.col),
                        batch_format="pyarrow")
    ds = ds.map_batches(LangIdStage, batch_format="pyarrow",
                        concurrency=_pool())
    ds = ds.map_batches(lambda b: token_count_batch(b, col=cfg.col),
                        batch_format="pyarrow")
    if cfg.gopher:
        from ..functions.text import gopher_rules_batch

        ds = ds.map_batches(
            lambda b: gopher_rules_batch(b, col=cfg.col, **cfg.gopher_kwargs),
            batch_format="pyarrow")
    if cfg.compression_min is not None or cfg.compression_max is not None:
        from ..functions.text import compression_ratio_batch

        ds = ds.map_batches(lambda b: compression_ratio_batch(b, col=cfg.col),
                            batch_format="pyarrow")
    if cfg.lm_reference is not None:
        from ..functions.text import lm_score, train_ngram_lm

        model = train_ngram_lm(cfg.lm_reference, col=cfg.col,
                               n_buckets=cfg.lm_n_buckets)
        ds = lm_score(ds, model, col=cfg.col)
    if cfg.clf_positive is not None:
        from ..functions.classifier import (classifier_score,
                                            train_quality_classifier)

        clf = train_quality_classifier(cfg.clf_positive, cfg.clf_negative,
                                       col=cfg.col,
                                       n_buckets=cfg.clf_n_buckets,
                                       epochs=cfg.clf_epochs)
        ds = classifier_score(ds, clf, col=cfg.col)
    return ds


def filter_documents(ds: ray.data.Dataset, cfg: CurationConfig) -> ray.data.Dataset:
    """Quality floor + language allowlist (+ optional repetition ceiling),
    one vectorized filter per batch."""
    langs = tuple(cfg.languages) if cfg.languages else None

    if cfg.repetition_max is not None:
        from ..functions.text import repetition_ratio_batch

        ds = ds.map_batches(lambda b: repetition_ratio_batch(b, col=cfg.col),
                            batch_format="pyarrow")

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b.column("quality_score"), cfg.quality_min)
        if langs is not None:
            # filter on the PREDICTED language (LangIdStage's lang_pred) —
            # curation cannot assume the input carries trusted labels
            mask = pc.and_(mask, pc.is_in(b.column("lang_pred"),
                                          value_set=pa.array(langs)))
        if cfg.repetition_max is not None:
            mask = pc.and_(mask, pc.less_equal(b.column("repetition_ratio"),
                                               cfg.repetition_max))
        if cfg.gopher:
            mask = pc.and_(mask, b.column("gopher_pass"))
        if cfg.compression_min is not None:
            mask = pc.and_(mask, pc.greater_equal(
                b.column("compression_ratio"), cfg.compression_min))
        if cfg.compression_max is not None:
            mask = pc.and_(mask, pc.less_equal(
                b.column("compression_ratio"), cfg.compression_max))
        if cfg.lm_max_bits is not None:
            # NaN (empty doc) compares false -> dropped, like the reference
            # quality floor would drop it anyway
            mask = pc.and_(mask, pc.less_equal(b.column("lm_bits"),
                                               cfg.lm_max_bits))
        if cfg.clf_min_prob is not None:
            mask = pc.and_(mask, pc.greater_equal(b.column("clf_prob"),
                                                  cfg.clf_min_prob))
        if cfg.clf_pareto_alpha is not None:
            from ..functions.sampling import SIXTY_BITS, hash60

            # GPT-3's filter: keep iff pareto(alpha) > 1 - prob, with the
            # draw derived from hash60(seed|id) so the decision is a pure
            # function of (seed, id, prob)
            u = (hash60(b.column(cfg.id_col).to_pylist(),
                        f"{cfg.seed}|pareto").astype(np.float64)
                 + 0.5) / SIXTY_BITS
            draw = u ** (-1.0 / cfg.clf_pareto_alpha) - 1.0
            prob = b.column("clf_prob").to_numpy(zero_copy_only=False)
            mask = pc.and_(mask, pa.array(draw > 1.0 - prob))
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def remove_near_duplicates(ds: ray.data.Dataset, cfg: CurationConfig) -> ray.data.Dataset:
    """Drop every near-dup cluster member except one representative.

    ``near_dup_keep='min_id'`` (default): duplicate_clusters labels each
    clustered doc with cluster_id = min member id, so the loser set is
    exactly {doc_id != cluster_id}. ``'best_quality'``: the winner is the
    member with the highest annotated quality_score (ties -> min id) — the
    cluster table (small: clustered docs only) fetches scores through the
    distributed lookup join and each cluster group keeps its argmax. Either
    way losers are anti-joined out distributedly (no driver-side id set)."""
    from ..functions.dedup import (duplicate_clusters,
                                   jaccard_similarity_join,
                                   minhash_lsh_pairs)
    from ..functions.relational import semi_join

    if cfg.near_dup_exact:
        pairs = jaccard_similarity_join(ds, col=cfg.col, id_col=cfg.id_col,
                                        threshold=cfg.jaccard_threshold)
    else:
        pairs = minhash_lsh_pairs(ds, col=cfg.col, id_col=cfg.id_col,
                                  jaccard_threshold=cfg.jaccard_threshold,
                                  **cfg.minhash_kwargs)
    clusters = duplicate_clusters(pairs)

    if cfg.near_dup_keep == "best_quality":
        import pandas as pd

        from ..functions.relational import lookup_join

        score_side = ds.select_columns([cfg.id_col, "quality_score"]) \
                       .map_batches(lambda t: t.rename_columns(
                           ["doc_id", "quality_score"]),
                           batch_format="pyarrow")
        scored = lookup_join(clusters, score_side,
                             on="doc_id", value_col="quality_score")

        def cluster_losers(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["quality_score", "doc_id"],
                              ascending=[False, True], kind="mergesort")
            return g.iloc[1:][["doc_id"]]

        loser_ids = (scored.groupby("cluster_id")
                     .map_groups(cluster_losers, batch_format="pandas"))
    elif cfg.near_dup_keep == "min_id":
        def losers(b: pa.Table) -> pa.Table:
            m = pc.not_equal(b.column("doc_id"), b.column("cluster_id"))
            return b.filter(m).select(["doc_id"])

        loser_ids = clusters.map_batches(losers, batch_format="pyarrow")
    else:
        raise ValueError(f"near_dup_keep must be 'min_id' or 'best_quality',"
                         f" got {cfg.near_dup_keep!r}")
    return semi_join(ds, loser_ids, on=cfg.id_col, anti=True)


def _stage_sums(cfg: CurationConfig):
    """Per-batch partial sums for the audit report: rows, utf8 chars of the
    text column, ws_tokens when annotated. One tiny C-kernel pass."""
    def sums(b: pa.Table) -> pa.Table:
        chars = ws = 0
        if cfg.col in b.column_names:
            chars = int(pc.sum(pc.utf8_length(b.column(cfg.col))).as_py()
                        or 0)
        if "ws_tokens" in b.column_names:
            ws = int(pc.sum(b.column("ws_tokens")).as_py() or 0)
        return pa.table({"rows": pa.array([b.num_rows], pa.int64()),
                         "chars": pa.array([chars], pa.int64()),
                         "ws": pa.array([ws], pa.int64())})
    return sums


def curate_documents_with_report(ds: ray.data.Dataset,
                                 cfg: CurationConfig | None = None):
    """Audit/report mode: run ``curate_documents`` with a checkpoint after
    every enabled stage, recording the retention funnel — rows, utf8 chars,
    ws_tokens (once annotated), kept_frac vs the previous stage — and each
    stage's wall time. The curated output is IDENTICAL to a plain
    ``curate_documents`` run (every stage is a pure function of input +
    seed); the checkpoints only pin what the lazy DAG would recompute.
    Returns ``(curated, report)`` — report is a list of per-stage dicts in
    execution order, JSON-ready (the curation analog of the alignment job's
    per-partition manifest metrics, state/checkpoint.py).

    At 100 TB each checkpoint is the same spill-backed materialize the
    pipeline already uses at its multi-consumer boundaries; report mode
    extends it to every stage — the audit run a production deploy does once
    per recipe change, not the steady-state shape."""
    report: list = []
    out = curate_documents(ds, cfg, _report=report)
    return out, report


def curate_documents(ds: ray.data.Dataset,
                     cfg: CurationConfig | None = None,
                     _report: list | None = None) -> ray.data.Dataset:
    """The full annotate -> filter -> dedup -> near-dup -> sample chain.
    Returns the curated corpus with the annotation columns attached."""
    import time

    from ..functions.dedup import exact_dedup
    from ..functions.sampling import hash_sample

    cfg = cfg or CurationConfig()
    _t = [time.time()]

    def tap(d: ray.data.Dataset, name: str) -> ray.data.Dataset:
        if _report is None:
            return d
        d = d.materialize()
        parts = d.map_batches(_stage_sums(cfg),
                              batch_format="pyarrow").take_all()
        rec = {"stage": name,
               "rows": int(sum(p["rows"] for p in parts)),
               "chars": int(sum(p["chars"] for p in parts)),
               "ws_tokens": int(sum(p["ws"] for p in parts)),
               "wall_s": round(time.time() - _t[0], 3)}
        if _report:
            prev = _report[-1]["rows"]
            rec["kept_frac"] = round(rec["rows"] / prev, 6) if prev else None
        _report.append(rec)
        _t[0] = time.time()
        return d

    ds = tap(ds, "input")
    if cfg.lm_max_bits is not None and cfg.lm_reference is None:
        raise ValueError("lm_max_bits needs lm_reference to train on")
    if cfg.semantic_threshold is not None and cfg.embeddings is None \
            and cfg.embed_dim is None:
        raise ValueError("semantic_threshold needs an embeddings table or "
                         "embed_dim (hashed n-gram embeddings from text)")
    if cfg.embeddings is not None and cfg.embed_dim is not None:
        raise ValueError("set embeddings OR embed_dim, not both")
    if (cfg.dsir_k is not None or cfg.dsir_fraction is not None) \
            and cfg.dsir_target is None:
        raise ValueError("dsir_k/dsir_fraction need a dsir_target corpus")
    if (cfg.clf_positive is None) != (cfg.clf_negative is None):
        raise ValueError("clf_positive and clf_negative must be set together"
                         " (the classifier trains positive VS negative)")
    if (cfg.clf_min_prob is not None or cfg.clf_pareto_alpha is not None) \
            and cfg.clf_positive is None:
        raise ValueError("clf_min_prob/clf_pareto_alpha need clf_positive "
                         "and clf_negative training corpora")
    if cfg.dedup_lines:
        from ..functions.text import dedup_lines_within_doc_batch

        ds = ds.map_batches(
            lambda b: dedup_lines_within_doc_batch(b, col=cfg.col),
            batch_format="pyarrow")
        ds = tap(ds, "dedup_lines")
    if cfg.c4:
        from ..functions.text import c4_clean_batch

        ds = (ds.map_batches(
                  lambda b: c4_clean_batch(b, col=cfg.col, **cfg.c4_kwargs),
                  batch_format="pyarrow")
              .map_batches(lambda b: b.filter(b.column("c4_doc_ok"))
                           .drop_columns(["c4_doc_ok"]),
                           batch_format="pyarrow"))
        ds = tap(ds, "c4")
    if cfg.boilerplate_min_docs is not None:
        from ..functions.text import remove_boilerplate_lines

        ds = remove_boilerplate_lines(ds, col=cfg.col, id_col=cfg.id_col,
                                      min_docs=cfg.boilerplate_min_docs)
        ds = tap(ds, "boilerplate")
    if cfg.passage_k is not None:
        from ..functions.text import remove_repeated_passages

        ds = remove_repeated_passages(ds, col=cfg.col, id_col=cfg.id_col,
                                      k=cfg.passage_k,
                                      min_docs=cfg.passage_min_docs)
        ds = tap(ds, "passages")
    ds = annotate_documents(ds, cfg)
    ds = tap(ds, "annotate")
    ds = filter_documents(ds, cfg)
    ds = tap(ds, "filter")
    if cfg.benchmark is not None:
        from ..functions.dedup import decontaminate

        ds = decontaminate(ds, cfg.benchmark, col=cfg.col, id_col=cfg.id_col,
                           shingle_k=cfg.decontam_shingle_k)
        ds = tap(ds, "decontaminate")
    ds = exact_dedup(ds, col=cfg.col, id_col=cfg.id_col)
    ds = tap(ds, "exact_dedup")
    if cfg.near_dup:
        # The near-dup stage consumes its input THREE times (sketch pass,
        # candidate-text fetch, anti-join); a lazy input would re-execute
        # the whole annotate->filter->dedup upstream per consumer. Pin the
        # curated-so-far corpus ONCE — object-store blocks, spill-backed
        # (the 100 TB analog is a parquet checkpoint between major stages,
        # exactly what a resumable production run wants here anyway).
        ds = ds.materialize()
        ds = remove_near_duplicates(ds, cfg)
        ds = tap(ds, "near_dup")
    if cfg.semantic_threshold is not None:
        # SemDeDup over the survivors' embeddings: the (small) survivor-id
        # projection restricts the embedding table, the (small) kept-id set
        # semi-joins back — both distributed, neither side broadcasts
        from ..functions.relational import semi_join
        from ..functions.similarity import semantic_dedup_keep_ids

        ds = ds.materialize()  # consumed by id projection AND anti-join
        # pin the restricted embedding table too: keep_ids consumes it
        # several times (count, codebook sample, refine passes, assignment)
        if cfg.embeddings is not None:
            emb = semi_join(cfg.embeddings, ds.select_columns([cfg.id_col]),
                            on=cfg.id_col)
        else:
            # sketch embeddings from the survivors' own text (every survivor
            # is embedded, so the loser anti-join below covers the corpus)
            from ..functions.embed import embed_documents
            emb = embed_documents(
                ds.select_columns([cfg.id_col, cfg.col]), col=cfg.col,
                dim=cfg.embed_dim, k=cfg.embed_k, seed=cfg.embed_seed,
                out_col=cfg.embedding_col).drop_columns([cfg.col])
        emb = emb.materialize()
        kept = semantic_dedup_keep_ids(emb, threshold=cfg.semantic_threshold,
                                       vec_col=cfg.embedding_col,
                                       id_col=cfg.id_col,
                                       **cfg.semantic_kwargs)
        # remove LOSERS (embedded survivors that were pruned) rather than
        # keeping winners: a doc with no embedding row is untouched — a
        # dedup stage must never silently delete un-embedded documents
        losers = semi_join(emb.select_columns([cfg.id_col]),
                           kept.select_columns([cfg.id_col]),
                           on=cfg.id_col, anti=True)
        ds = semi_join(ds, losers, on=cfg.id_col, anti=True)
        ds = tap(ds, "semantic_dedup")
    if cfg.dsir_target is not None and (cfg.dsir_k is not None
                                        or cfg.dsir_fraction is not None):
        # DSIR toward the target domain: raw model trains on the survivors
        # themselves; the resample makes several streaming passes, so pin
        # the corpus once (same contract as the near-dup stage)
        from ..functions.sampling import dsir_resample
        from ..functions.text import train_ngram_lm

        ds = ds.materialize()
        t_model = train_ngram_lm(cfg.dsir_target, col=cfg.col,
                                 n_buckets=cfg.lm_n_buckets)
        r_model = train_ngram_lm(ds, col=cfg.col, n_buckets=cfg.lm_n_buckets)
        ds = dsir_resample(ds, t_model, r_model, k=cfg.dsir_k,
                           fraction=cfg.dsir_fraction, col=cfg.col,
                           id_col=cfg.id_col, seed=cfg.seed)
        ds = tap(ds, "dsir")
    if cfg.sample_fraction is not None:
        ds = hash_sample(ds, cfg.sample_fraction, id_col=cfg.id_col,
                         seed=cfg.seed)
        ds = tap(ds, "sample")
    if cfg.unimax_budget_total is not None:
        # domain-balanced final cut: UniMax waterfill over per-domain token
        # totals of the SURVIVORS, each domain's allocation selected in
        # deterministic hash order (unimax_select pins its own projection)
        from ..functions.sampling import unimax_select

        ds = unimax_select(ds.materialize(), cfg.unimax_budget_total,
                           max_epochs=cfg.unimax_max_epochs,
                           domain_col=cfg.unimax_domain_col,
                           id_col=cfg.id_col, seed=cfg.seed)
        ds = tap(ds, "unimax")
    if cfg.token_budget_total is not None:
        # final cut: the best-quality survivors that fit the training
        # budget (exact sort-prefix semantics, no global sort). Multiple
        # histogram passes consume the input — pin it once, like near-dup.
        from ..functions.sampling import select_token_budget

        ds = select_token_budget(ds.materialize(), cfg.token_budget_total,
                                 id_col=cfg.id_col, seed=cfg.seed)
        ds = tap(ds, "token_budget")
    return ds


def curate_and_pack(ds: ray.data.Dataset, cfg: CurationConfig | None = None,
                    token_budget: int = 2048):
    """Curate, then assign the survivors to fixed-budget training sequences.
    Returns (curated_ds, packed_ds) — packed is (doc_id, ws_tokens, seq_id,
    seq_offset) from functions.text.pack_sequences."""
    from ..functions.text import pack_sequences

    cfg = cfg or CurationConfig()
    curated = curate_documents(ds, cfg)
    packed = pack_sequences(curated, token_budget=token_budget,
                            id_col=cfg.id_col, col=cfg.col)
    return curated, packed


# --- interleaved documents (the north-rule input shape) ----------------------

def extract_document_text(batch: pa.Table, col: str = "text",
                          sep: str = " ") -> pa.Table:
    """(doc_id, spans) -> (doc_id, text): concatenate each document's
    text-kind spans in span order. Pure Arrow work — offsets arithmetic +
    one C++ binary_join per batch, no Python per span."""
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]
    n_per_doc = np.diff(offsets)
    doc_idx = np.repeat(np.arange(batch.num_rows), n_per_doc)
    is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
    sel = np.nonzero(is_text)[0]
    kept_counts = np.bincount(doc_idx[sel], minlength=batch.num_rows)
    new_off = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    texts = pc.fill_null(flat.field("text").take(pa.array(sel)), "")
    lst = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                   texts.combine_chunks()
                                   if isinstance(texts, pa.ChunkedArray)
                                   else texts)
    return pa.table({"doc_id": batch.column("doc_id"),
                     col: pc.binary_join(lst, sep)})


def curate_interleaved(docs: ray.data.Dataset,
                       cfg: CurationConfig | None = None) -> ray.data.Dataset:
    """Curation over the north rule's interleaved span table
    (doc_id, spans: list<struct<kind, text, media_ref, offset>>): a
    document's curation text is the concatenation of its text-kind spans;
    SURVIVING documents keep their span sequences byte-for-byte (kind,
    text, media_ref, order — the per-row invariant the reference contract
    pins). One span-table projection pass feeds the flat curation DAG, and
    survivors are selected with the distributed semi-join — the span table
    itself is never shuffled or rewritten. ``docs`` is consumed twice
    (projection + semi-join); from parquet/Lance both are streaming
    re-reads, so nothing materializes.

    With ``cfg.media`` set (a (media_ref, payload) Dataset), media-payload
    dedup runs FIRST: duplicate payloads are canonicalized by content hash
    and every surviving span points at the canonical ref
    (pipelines.documents.dedup_media_payloads) — the span invariant then
    holds on (kind, text, order) with media_ref equal up to the canonical
    remap."""
    from ..functions.relational import semi_join

    cfg = cfg or CurationConfig()
    if cfg.media is not None:
        from .documents import dedup_media_payloads

        docs, _, remap = dedup_media_payloads(docs, cfg.media,
                                              **cfg.media_kwargs)
        if remap.count():
            # two downstream consumers (projection + semi-join) would
            # re-run the rewrite on a lazy input; pin the rewritten corpus
            # once. With zero remaps dedup returned the input unchanged —
            # nothing to pin, the streaming re-read contract stands.
            docs = docs.materialize()
    flat = docs.map_batches(
        lambda b: extract_document_text(b, col=cfg.col),
        batch_format="pyarrow")
    kept = curate_documents(flat, cfg)
    ids = kept.select_columns([cfg.id_col])
    return semi_join(docs, ids, on=cfg.id_col)

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from ..functions.pool import actor_pool
    return actor_pool()
