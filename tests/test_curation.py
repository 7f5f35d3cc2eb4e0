"""End-to-end curation pipeline (pipelines/curation.py)."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.pipelines.curation import (
    CurationConfig, curate_and_pack, curate_documents)

GOOD = ("the quick brown fox jumps over the lazy dog while the rain keeps "
        "falling on the quiet town and the people walk slowly home through "
        "the evening light carrying baskets of bread and fruit")

OTHER = ("a narrow boat drifts along the green river past tall reeds and "
         "old stone bridges where children wave at the sailors and gulls "
         "circle above the market square looking for scraps of fish")


def _corpus() -> pa.Table:
    texts, ids = [], []
    # 5 exact copies -> 1 survivor (min id 0)
    for i in range(5):
        ids.append(i)
        texts.append(GOOD)
    # near-dup pair (one word changed, distinct base text so it does not
    # also near-match GOOD) -> 1 survivor (min id 10)
    ids += [10, 11]
    texts += [OTHER.replace("bridges", "arches"),
              OTHER.replace("bridges", "spans")]
    # unique good docs
    for i in range(20, 26):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}").replace("town", f"town{i}")
                     + f" unique marker {i} " + " ".join(
                         f"w{i}x{j}" for j in range(10)))
    # junk: too short -> below the quality floor
    ids += [90, 91]
    texts += ["x", "!!"]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def curated(ray_session):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7)
    out = curate_documents(ray.data.from_arrow(_corpus()), cfg).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_exact_dup_collapsed(curated):
    assert (curated["doc_id"].isin(range(5))).sum() == 1
    assert 0 in set(curated["doc_id"])  # min-id winner


def test_near_dup_collapsed(curated):
    assert (curated["doc_id"].isin([10, 11])).sum() == 1
    assert 10 in set(curated["doc_id"])  # min-id representative


def test_quality_junk_dropped(curated):
    assert not curated["doc_id"].isin([90, 91]).any()


def test_unique_docs_survive_with_annotations(curated):
    uniq = curated[curated["doc_id"].between(20, 25)]
    assert len(uniq) == 6
    for col in ("quality_score", "lang_pred", "ws_tokens", "n_words"):
        assert col in curated.columns


def test_deterministic_rerun(ray_session, curated):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7)
    again = (curate_documents(ray.data.from_arrow(_corpus()), cfg)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(again["doc_id"]) == list(curated["doc_id"])


def test_sample_leg_is_hash_predicate(ray_session, curated):
    import ray.data
    from brdrq_ray.functions.sampling import fraction_threshold, hash60

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         sample_fraction=0.5, seed="s")
    out = curate_documents(ray.data.from_arrow(_corpus()), cfg).to_pandas()
    full = set(curated["doc_id"])
    expect = {i for i in full
              if hash60([i], "s")[0] < fraction_threshold(0.5)}
    assert set(out["doc_id"]) == expect


def test_curate_and_pack_accounts_every_survivor(ray_session, curated):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True)
    cur, packed = curate_and_pack(ray.data.from_arrow(_corpus()), cfg,
                                  token_budget=64)
    pk = packed.to_pandas()
    assert sorted(pk["doc_id"]) == sorted(curated["doc_id"])
    # packing respects the budget for multi-doc sequences
    tot = pk.groupby("seq_id")["ws_tokens"].sum()
    multi = pk.groupby("seq_id").size() > 1
    assert (tot[multi[multi].index] <= 64).all()


def test_language_allowlist(ray_session):
    import ray.data

    # texts built from the LangIdStage profile vocabulary so predictions are
    # deterministic: one clearly-English doc, one clearly-Dutch doc
    en = "the spark and the light for the best estate " * 4
    nl = "de het een van aan de lijkheid en de oorzaak " * 4
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([en, nl], pa.string())})
    cfg = CurationConfig(quality_min=0.0, near_dup=False, languages=("en",))
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert list(out["lang_pred"]) == ["en"]


def test_clusters_small_path_equals_distributed(ray_session):
    """The union-find fast path and the min-label-propagation path must
    produce the identical (doc_id, cluster_id) table."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import duplicate_clusters

    rng = np.random.default_rng(5)
    # random sparse graph incl. a long chain (exercises label shortcutting)
    a = rng.integers(0, 60, size=40)
    b = rng.integers(0, 60, size=40)
    keep = a != b
    ids_a = np.concatenate([a[keep], np.arange(100, 131)])
    ids_b = np.concatenate([b[keep], np.arange(101, 132)])  # chain 100..131
    pairs = pa.table({"id_a": pa.array(ids_a, pa.int64()),
                      "id_b": pa.array(ids_b, pa.int64())})
    small = (duplicate_clusters(ray.data.from_arrow(pairs))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (duplicate_clusters(ray.data.from_arrow(pairs), small_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert small.equals(dist)
    # chain collapses to one cluster rooted at its min member
    assert (small[small["doc_id"].between(100, 131)]["cluster_id"] == 100).all()


def test_optional_stages_boilerplate_repetition_decontam(ray_session):
    """The three opt-in stages compose: frequent lines are stripped before
    annotation, repetitive docs and benchmark-leaking docs drop."""
    import pyarrow as pa
    import ray.data

    bench_q = ("what is the tallest mountain in the wide green world today "
               "friends ask")
    footer = "Accept all cookies and subscribe"
    texts, ids = [], []
    for i in range(8):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}") + f" unique {i}\n{footer}")
    ids.append(50)   # repetitive spam
    texts.append("buy cheap stuff now " * 30)
    ids.append(60)   # benchmark leak
    texts.append(GOOD + " " + bench_q)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    bench = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([bench_q])}))
    cfg = CurationConfig(quality_min=0.2, near_dup=False,
                         boilerplate_min_docs=5, repetition_max=0.5,
                         benchmark=bench)
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert set(out["doc_id"]) == set(range(8))
    assert not out["text"].str.contains("cookies").any()


def test_optional_stage_passage_excision(ray_session):
    """passage_k wires cross-doc repeated-passage removal in before
    annotation: the shared passage disappears from every survivor, unique
    text stays, and the audit column rides through the pipeline."""
    import pyarrow as pa
    import ray.data

    shared = "this exact boilerplate passage repeats verbatim across many documents tonight"
    texts, ids = [], []
    for i in range(6):
        ids.append(i)
        # marker{i} and {i} flank "unique" so no k=5 window covering it is
        # identical across docs (GOOD's own shared tail would otherwise
        # excise it too)
        texts.append(GOOD.replace("fox", f"fox{i}")
                     + f" marker{i} unique {i} " + shared)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         passage_k=5, passage_min_docs=3)
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert set(out["doc_id"]) == set(range(6))
    assert not out["text"].str.contains("boilerplate passage").any()
    assert (out["text"].str.contains("unique")).all()
    assert (out["passage_words_removed"] > 0).all()


def test_curate_interleaved_preserves_span_sequences(ray_session):
    """Curation over the interleaved span table: survivors keep their span
    sequences byte-for-byte (kind, text, media_ref, order); duplicate-text
    docs collapse to the min-id representative even when their media spans
    differ."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.pipelines.curation import (curate_interleaved,
                                              extract_document_text)

    def doc(i, text_parts, media=None):
        spans = []
        for j, t in enumerate(text_parts):
            spans.append({"kind": "text", "text": t,
                          "media_ref": "", "offset": j})
        if media:
            spans.insert(1, {"kind": "image", "text": "",
                             "media_ref": media, "offset": 99})
        return {"doc_id": i, "spans": spans}

    rows = [doc(0, [GOOD, "extra tail zero"], media="img0"),
            doc(1, [GOOD, "extra tail zero"], media="DIFFERENT"),  # text dup of 0
            doc(2, [OTHER, "unique second span two"], media="img2"),
            doc(3, ["x"])]                                         # junk: too short
    tbl = pa.Table.from_pylist(rows)
    cfg = CurationConfig(quality_min=0.40, near_dup=False)
    out = (curate_interleaved(ray.data.from_arrow(tbl), cfg)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc1 (text dup, higher id) and doc3 (junk) dropped; 0 and 2 survive
    assert list(out["doc_id"]) == [0, 2]
    orig = tbl.to_pylist()
    for _, row in out.iterrows():
        want = next(r["spans"] for r in orig if r["doc_id"] == row["doc_id"])
        assert list(row["spans"]) == want  # byte-for-byte span sequence
    # the text projection concatenates text spans only, in order
    flat = extract_document_text(tbl).to_pylist()
    assert flat[0]["text"] == GOOD + " extra tail zero"
    assert flat[3]["text"] == "x"


def test_string_ids_dedup_family(ray_session, tmp_path):
    """The north rule's doc_id is a STRING — the whole near-dup family must
    work without integer ids: pair listing, both cluster paths (identical),
    and the incremental band index through a parquet round-trip."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import (
        build_minhash_index, duplicate_clusters, minhash_lsh_pairs,
        minhash_pairs_incremental)

    rng = np.random.default_rng(4)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    old_texts = {f"doc-{i:04d}": " ".join(rng.choice(words, size=20))
                 for i in range(30)}
    new_texts = {"new-0001": old_texts["doc-0003"] + " tail",
                 "new-0002": " ".join(rng.choice(words, size=20))}
    old = pa.table({"doc_id": pa.array(list(old_texts)),
                    "text": pa.array(list(old_texts.values()))})
    new = pa.table({"doc_id": pa.array(list(new_texts)),
                    "text": pa.array(list(new_texts.values()))})

    pairs = minhash_lsh_pairs(ray.data.from_arrow(pa.concat_tables([old, new])),
                              jaccard_threshold=0.5)
    small = (duplicate_clusters(pairs).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    dist = (duplicate_clusters(pairs, small_limit=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert small.equals(dist)
    assert dict(zip(small["doc_id"], small["cluster_id"]))["new-0001"] == "doc-0003"

    idx_dir = str(tmp_path / "mhidx_str")
    build_minhash_index(ray.data.from_arrow(old), idx_dir, n_shards=16)
    inc = minhash_pairs_incremental(ray.data.from_arrow(new), idx_dir,
                                    corpus_ds=ray.data.from_arrow(old),
                                    jaccard_threshold=0.5).to_pandas()
    assert ("doc-0003", "new-0001") in set(zip(inc["id_a"], inc["id_b"]))


def test_curate_interleaved_fixture_string_ids(ray_session):
    """The interleaved fixture (string doc_ids, text+media+geometry spans)
    runs the full curation DAG including near-dup; survivors' span
    sequences stay byte-identical across forced block slices."""
    import ray.data
    from brdrq_ray.pipelines.curation import curate_interleaved
    from brdrq_ray.sources.fixtures import make_documents_table

    tbl = make_documents_table(n_docs=120)
    ds = ray.data.from_arrow(tbl).repartition(6)  # force block slices
    out = curate_interleaved(
        ds, CurationConfig(quality_min=0.0, near_dup=True,
                           jaccard_threshold=0.5)).to_pandas()
    assert 0 < len(out) <= tbl.num_rows
    orig = {r["doc_id"]: r["spans"] for r in tbl.to_pylist()}
    for _, row in out.iterrows():
        assert list(row["spans"]) == orig[row["doc_id"]]


def test_token_budget_stage(ray_session):
    """token_budget_total keeps the best-quality survivors that fit the
    budget, exactly the deterministic sort-prefix."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.sampling import hash60

    texts, ids = [], []
    for i in range(12):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}") + f" unique marker {i}")
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         token_budget_total=120)
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert 0 < len(out) < 12
    assert out["ws_tokens"].sum() <= 120
    # equals the pandas sort-prefix over the annotated corpus
    full = curate_documents(ray.data.from_arrow(tbl),
                            CurationConfig(quality_min=0.0, near_dup=False)
                            ).to_pandas()
    full["h"] = hash60([str(v) for v in full["doc_id"]], "curate")
    ordered = full.sort_values(["quality_score", "h", "doc_id"],
                               ascending=[False, True, True], kind="mergesort")
    want = set(ordered[ordered["ws_tokens"].cumsum() <= 120]["doc_id"])
    assert set(out["doc_id"]) == want


# --- round-4 second-session stages: LM gate, SemDeDup, DSIR ------------------

def test_optional_stage_lm_gate(ray_session):
    import ray.data

    from brdrq_ray.functions.text import lm_score, train_ngram_lm

    corpus = _corpus()
    ref = ray.data.from_arrow(pa.table({
        "text": pa.array([GOOD, OTHER, GOOD.replace("fox", "hare")])}))
    # pick a cap that separates the in-distribution docs from the junk:
    # score the corpus once and thread the observed split point through
    model = train_ngram_lm(ref, n_buckets=1 << 14)
    bits = (lm_score(ray.data.from_arrow(corpus), model)
            .to_pandas().set_index("doc_id")["lm_bits"])
    cap = float(bits[0]) + 0.5  # GOOD's score + slack
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         lm_reference=ref, lm_max_bits=cap,
                         lm_n_buckets=1 << 14)
    out = curate_documents(ray.data.from_arrow(corpus), cfg).to_pandas()
    assert "lm_bits" in out.columns
    kept = set(out["doc_id"])
    assert 0 in kept                      # in-distribution survives
    assert not {90, 91} & kept            # junk scores above the cap
    # the filter is exactly the cap applied to the scored corpus, after the
    # always-on exact dedup keeps the min-id copy of each unique text
    texts = dict(zip(corpus.column("doc_id").to_pylist(),
                     corpus.column("text").to_pylist()))
    first_of_text = {}
    for i in sorted(texts):
        first_of_text.setdefault(texts[i], i)
    expected = {i for i in bits[bits <= cap].index
                if first_of_text[texts[i]] == i}
    assert kept == expected


def test_lm_gate_requires_reference(ray_session):
    import ray.data

    with pytest.raises(ValueError, match="lm_reference"):
        curate_documents(ray.data.from_arrow(_corpus()),
                         CurationConfig(lm_max_bits=10.0))


def test_optional_stage_semantic_dedup(ray_session):
    import ray.data

    corpus = _corpus()
    ids = corpus.column("doc_id").to_pylist()
    # embeddings: doc 20 and 21 nearly identical vectors, rest orthogonal-ish
    rng = np.random.default_rng(7)
    vecs = {i: rng.standard_normal(8) for i in ids}
    vecs[21] = vecs[20] + rng.standard_normal(8) * 1e-3
    emb = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, vecs[i])) for i in ids])}))
    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7, embeddings=emb,
                         semantic_threshold=0.95)
    out = curate_documents(ray.data.from_arrow(corpus), cfg).to_pandas()
    kept = set(out["doc_id"])
    assert len({20, 21} & kept) == 1      # semantic pair collapsed
    assert {22, 23, 24, 25} <= kept       # distinct vectors survive
    with pytest.raises(ValueError, match="embeddings"):
        curate_documents(ray.data.from_arrow(corpus),
                         CurationConfig(semantic_threshold=0.9))


def test_optional_stage_dsir(ray_session):
    import ray.data

    corpus = _corpus()
    target = ray.data.from_arrow(pa.table({
        "text": pa.array([GOOD, GOOD.replace("fox", "wolf"),
                          GOOD.replace("rain", "snow")])}))
    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7, dsir_target=target,
                         dsir_k=3, lm_n_buckets=1 << 14)
    out = curate_documents(ray.data.from_arrow(corpus), cfg).to_pandas()
    assert len(out) == 3
    assert "dsir_logw" in out.columns
    # deterministic re-run
    again = curate_documents(ray.data.from_arrow(corpus), cfg).to_pandas()
    assert set(out["doc_id"]) == set(again["doc_id"])
    with pytest.raises(ValueError, match="dsir_target"):
        curate_documents(ray.data.from_arrow(corpus),
                         CurationConfig(dsir_k=3))


def test_curate_interleaved_with_lm_gate(ray_session):
    """The opt-in LM stage composes through the interleaved path: the
    concatenated text spans are what gets scored, and survivors keep their
    span sequences untouched."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.pipelines.curation import curate_interleaved

    def doc(i, text):
        return {"doc_id": i,
                "spans": [{"kind": "text", "text": text,
                           "media_ref": "", "offset": 0}]}

    rows = [doc(0, GOOD), doc(1, OTHER),
            doc(2, "zxq qqw wvv bnm plk jhg fds aaa bbb ccc ddd eee fff "
                   "ggg hhh iii jjj kkk lll mmm nnn ooo ppp qqq rrr sss")]
    tbl = pa.Table.from_pylist(rows)
    ref = ray.data.from_arrow(pa.table({"text": pa.array([GOOD, OTHER])}))
    from brdrq_ray.functions.text import lm_score, train_ngram_lm
    from brdrq_ray.pipelines.curation import extract_document_text

    model = train_ngram_lm(ref, n_buckets=1 << 14)
    flat_bits = (lm_score(ray.data.from_arrow(extract_document_text(tbl)),
                          model).to_pandas().set_index("doc_id")["lm_bits"])
    cap = float(flat_bits[[0, 1]].max()) + 0.1
    assert flat_bits[2] > cap  # the gibberish doc really is above the cap
    cfg = CurationConfig(quality_min=0.0, near_dup=False, lm_reference=ref,
                         lm_max_bits=cap, lm_n_buckets=1 << 14)
    out = (curate_interleaved(ray.data.from_arrow(tbl), cfg)
           .to_pandas().sort_values("doc_id"))
    assert list(out["doc_id"]) == [0, 1]
    orig = tbl.to_pylist()
    for _, row in out.iterrows():
        want = next(r["spans"] for r in orig if r["doc_id"] == row["doc_id"])
        assert list(row["spans"]) == want


def test_optional_stage_quality_classifier(ray_session):
    """Classifier gate: hard cap and the deterministic Pareto draw."""
    import pyarrow as pa
    import ray.data

    spam = ["buy cheap pills now click here win win win",
            "zzz qqq xxx free money casino jackpot spin spin",
            "hot deals hot deals limited offer act fast buy buy"]
    pos = ray.data.from_arrow(pa.table({"text": pa.array(
        [GOOD, OTHER, GOOD.replace("fox", "hare")])}))
    neg = ray.data.from_arrow(pa.table({"text": pa.array(spam)}))
    ids = [0, 1, 50, 51]
    texts = [GOOD, OTHER.replace("bridges", "arches"),
             spam[0] + " extra", spam[1] + " extra"]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    base = dict(quality_min=0.0, near_dup=False, clf_positive=pos,
                clf_negative=neg, clf_n_buckets=1 << 12, clf_epochs=40)
    out = curate_documents(ray.data.from_arrow(tbl),
                           CurationConfig(**base, clf_min_prob=0.5)
                           ).to_pandas()
    assert set(out["doc_id"]) == {0, 1}
    assert "clf_prob" in out.columns
    # Pareto mode: deterministic across reruns, spam still disadvantaged
    # the draw is an exact deterministic rule: recompute it as an oracle
    # (training is deterministic, so retraining gives the same clf_prob)
    from brdrq_ray.functions.classifier import (classifier_score,
                                                train_quality_classifier)
    from brdrq_ray.functions.sampling import SIXTY_BITS, hash60

    cfgp = CurationConfig(**base, clf_pareto_alpha=2.0)
    a = curate_documents(ray.data.from_arrow(tbl), cfgp).to_pandas()
    b = curate_documents(ray.data.from_arrow(tbl), cfgp).to_pandas()
    a_ids = set(a["doc_id"]) if len(a) else set()
    b_ids = set(b["doc_id"]) if len(b) else set()
    clf = train_quality_classifier(pos, neg, n_buckets=1 << 12, epochs=40)
    sc = classifier_score(ray.data.from_arrow(tbl), clf).to_pandas()
    u = (hash60(sc["doc_id"].tolist(), "curate|pareto").astype(float)
         + 0.5) / SIXTY_BITS
    draw = u ** (-1.0 / 2.0) - 1.0
    want = set(sc["doc_id"][draw > 1.0 - sc["clf_prob"].to_numpy()])
    assert a_ids == want == b_ids
    with pytest.raises(ValueError, match="clf_positive"):
        curate_documents(ray.data.from_arrow(tbl),
                         CurationConfig(clf_min_prob=0.5))


def test_near_dup_best_quality_representative(ray_session):
    """near_dup_keep='best_quality' keeps the highest-quality cluster
    member instead of the min id."""
    import ray.data

    # 10 and 11 near-dup; give 11 the (strictly) better quality by making
    # 10 end with a long unpunctuated low-quality tail
    # punctuation junk tanks doc 10's quality score (0.65 vs 0.84) while
    # keeping word-shingle jaccard ~0.74 > the 0.5 threshold
    texts = {10: OTHER.replace("bridges", "arches") + " !! ?? !! ?? " * 10,
             11: OTHER.replace("bridges", "spans"),
             20: GOOD}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)])})
    base = dict(quality_min=0.0, near_dup=True, jaccard_threshold=0.5)
    best = curate_documents(ray.data.from_arrow(tbl),
                            CurationConfig(**base,
                                           near_dup_keep="best_quality")
                            ).to_pandas()
    minid = curate_documents(ray.data.from_arrow(tbl),
                             CurationConfig(**base)).to_pandas()
    assert 10 in set(minid["doc_id"]) and 11 not in set(minid["doc_id"])
    assert 11 in set(best["doc_id"]) and 10 not in set(best["doc_id"])
    assert 20 in set(best["doc_id"])
    q = best.set_index("doc_id")["quality_score"]
    m = minid.set_index("doc_id")["quality_score"]
    assert q[11] > m[10]  # the kept member really is the better one
    with pytest.raises(ValueError, match="near_dup_keep"):
        curate_documents(ray.data.from_arrow(tbl),
                         CurationConfig(**base, near_dup_keep="oops")
                         ).to_pandas()


def test_lm_perplexity_buckets(ray_session):
    import ray.data
    from brdrq_ray.functions.text import (lm_perplexity_buckets, lm_score,
                                          train_ngram_lm)

    ref = ray.data.from_arrow(pa.table({"text": pa.array([GOOD, OTHER])}))
    model = train_ngram_lm(ref, n_buckets=1 << 14)
    docs = [GOOD, OTHER,                               # in-distribution
            GOOD.replace("fox", "wolf"),               # near
            "zxq qqw wvv bnm plk jhg fds",             # gibberish
            "the market gulls circle the quiet town"]  # mixed
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs))), "text": pa.array(docs)}))
    out = (lm_perplexity_buckets(ds, model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert set(out["ppl_bucket"]) <= {"head", "middle", "tail"}
    # bucket order tracks lm_bits order: every head bit-score <= every
    # middle <= every tail
    for lo, hi in (("head", "middle"), ("middle", "tail")):
        lo_bits = out[out["ppl_bucket"] == lo]["lm_bits"]
        hi_bits = out[out["ppl_bucket"] == hi]["lm_bits"]
        if len(lo_bits) and len(hi_bits):
            assert lo_bits.max() <= hi_bits.min()
    # the gibberish doc lands in the worst occupied bucket
    worst = out.loc[out["lm_bits"].idxmax()]
    assert out[out["doc_id"] == 3]["ppl_bucket"].iloc[0] == worst["ppl_bucket"]
    with pytest.raises(ValueError, match="labels"):
        lm_perplexity_buckets(ds, model, quantiles=(0.5,),
                              labels=("a", "b", "c"))


def test_semantic_stage_keeps_unembedded_docs(ray_session):
    """Docs with no row in the embeddings table must pass the semantic
    stage untouched — the stage removes pruned EMBEDDED docs only."""
    import ray.data

    ids = [20, 21, 22, 99]  # 99 has no embedding row
    texts = {20: GOOD, 21: OTHER,
             22: GOOD.replace("fox", "hare").replace("rain", "snow"),
             99: OTHER.replace("boat", "raft").replace("river", "canal")}
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([texts[i] for i in ids])})
    rng = np.random.default_rng(11)
    vecs = {20: rng.standard_normal(8)}
    vecs[21] = vecs[20] + rng.standard_normal(8) * 1e-3  # near-dup of 20
    vecs[22] = rng.standard_normal(8)
    emb = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([20, 21, 22], pa.int64()),
        "embedding": pa.array([list(map(float, vecs[i]))
                               for i in (20, 21, 22)])}))
    cfg = CurationConfig(quality_min=0.0, near_dup=False, embeddings=emb,
                         semantic_threshold=0.95,
                         semantic_kwargs=dict(n_clusters=1, train_sample=4,
                                              distributed_train=False))
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    kept = set(out["doc_id"])
    assert 99 in kept                    # un-embedded doc untouched
    assert len({20, 21} & kept) == 1     # embedded near-dup pair collapsed
    assert 22 in kept


def test_clf_corpora_must_pair(ray_session):
    import ray.data

    pos = ray.data.from_arrow(pa.table({"text": pa.array([GOOD])}))
    with pytest.raises(ValueError, match="set together"):
        curate_documents(ray.data.from_arrow(_corpus()),
                         CurationConfig(clf_positive=pos))
    with pytest.raises(ValueError, match="set together"):
        curate_documents(ray.data.from_arrow(_corpus()),
                         CurationConfig(clf_negative=pos))


def test_unimax_budget_stage(ray_session):
    """unimax_budget_total balances the final cut across the domain column:
    waterfill over the survivors' per-domain token totals, then each domain
    keeps exactly its allocation's worth in deterministic hash order."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.sampling import hash60, unimax_budgets

    texts, ids, srcs = [], [], []
    for i in range(24):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}") + f" unique marker {i}")
        # skewed domains: 18 docs in 'big', 6 in 'small'
        srcs.append("big" if i < 18 else "small")
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs)})
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         unimax_budget_total=300)
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    # brute force over the annotated survivors
    full = curate_documents(ray.data.from_arrow(tbl),
                            CurationConfig(quality_min=0.0, near_dup=False)
                            ).to_pandas()
    counts = full.groupby("source")["ws_tokens"].sum().astype(int).to_dict()
    budgets = unimax_budgets(counts, 300)
    full["h"] = hash60([str(v) for v in full["doc_id"]], "curate")
    want = set()
    for d, b in budgets.items():
        sub = full[full["source"] == d].sort_values(["h", "doc_id"],
                                                    kind="mergesort")
        want |= set(sub[sub["ws_tokens"].cumsum() <= b]["doc_id"])
    assert set(out["doc_id"]) == want
    # the small domain is protected: it keeps a proportionally larger share
    got_by_src = out.groupby("source")["ws_tokens"].sum()
    assert got_by_src.get("small", 0) > 0
    assert got_by_src["big"] <= budgets["big"]


def test_curation_report_mode(ray_session):
    """curate_documents_with_report returns the identical curated corpus
    plus a per-stage retention funnel in execution order."""
    import ray.data
    from brdrq_ray.pipelines.curation import curate_documents_with_report

    ds = ray.data.from_arrow(_corpus())
    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7, dedup_lines=True,
                         sample_fraction=0.9)
    out, report = curate_documents_with_report(ds, cfg)
    plain = curate_documents(ray.data.from_arrow(_corpus()), cfg).to_pandas()
    assert set(out.to_pandas()["doc_id"]) == set(plain["doc_id"])
    stages = [r["stage"] for r in report]
    assert stages == ["input", "dedup_lines", "annotate", "filter",
                      "exact_dedup", "near_dup", "sample"]
    rows = [r["rows"] for r in report]
    assert rows[0] == _corpus().num_rows
    # rewrites keep rows; every filtering stage is monotone non-increasing
    assert rows[1] == rows[0] and rows[2] == rows[1]
    assert all(a >= b for a, b in zip(rows[2:], rows[3:]))
    assert rows[-1] == len(plain)
    # annotate onward carries token counts; every record is JSON-ready
    import json
    assert report[2]["ws_tokens"] > 0
    assert all(r["chars"] >= 0 and r["wall_s"] >= 0 for r in report)
    assert all("kept_frac" in r for r in report[1:])
    json.dumps(report)


def test_near_dup_exact_backend(ray_session):
    """near_dup_exact=True routes pair generation through the recall-1.0
    jaccard join. The fixture's GOOD variants sit at jaccard 0.5098 — just
    above the 0.5 threshold, where LSH banding detection is ~coin-flip — so
    the exact backend merges ALL of {0..4, 20..25} into one cluster while
    minhash keeps the pairs it happened to band. Exact survivors are
    therefore a SUBSET of minhash survivors, with the brute-force-correct
    cluster structure."""
    import ray.data

    t = _corpus()
    mh_ids = sorted(curate_documents(
        ray.data.from_arrow(t),
        CurationConfig(quality_min=0.3, jaccard_threshold=0.5,
                       near_dup_exact=False, sample_fraction=None)
    ).to_pandas()["doc_id"])
    ex_ids = sorted(curate_documents(
        ray.data.from_arrow(t),
        CurationConfig(quality_min=0.3, jaccard_threshold=0.5,
                       near_dup_exact=True, sample_fraction=None)
    ).to_pandas()["doc_id"])
    assert set(ex_ids) <= set(mh_ids)
    # exact: every GOOD variant is >= 0.5-similar to the copies -> one
    # cluster, min id 0 survives; the near-dup pair keeps min id 10
    assert 0 in ex_ids
    assert all(i not in ex_ids for i in (1, 2, 3, 4, 20, 21, 22, 23, 24, 25))
    assert 10 in ex_ids and 11 not in ex_ids
    # minhash found the exact copies (jaccard 1.0 always bands together)
    assert 0 in mh_ids and all(i not in mh_ids for i in (1, 2, 3, 4))
