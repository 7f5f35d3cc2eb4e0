"""Gopher quality rules + zlib compression-ratio signal (functions/text.py)
and their opt-in curation gates (pipelines/curation.py)."""

import zlib

import numpy as np
import pyarrow as pa

from brdrq_ray.functions.text import (compression_ratio_batch,
                                      gopher_rules_batch)

# a clean passage that passes every published Gopher rule (>=50 words,
# mean word length in [3,10], no symbols/bullets/ellipses, alphabetic,
# contains >=2 of {the, be, to, of, and, that, have, with})
CLEAN = ("the quick brown fox jumps over the lazy dog and runs to the wide "
         "river where the boats have landed with crates of apples that the "
         "farmers bring every morning before the market opens and the town "
         "slowly wakes to the sound of bells ringing across the old square "
         "while children chase pigeons between the stalls")


def _flags(table, row=0):
    t = gopher_rules_batch(table)
    return {n: t.column(n)[row].as_py()
            for n in t.column_names if n.startswith("gopher")}


def test_clean_doc_passes_all_rules():
    f = _flags(pa.table({"text": [CLEAN]}))
    assert all(f.values()), f


def test_word_count_rule():
    short = "the cat sat on the mat with that hat to be of and"
    f = _flags(pa.table({"text": [short]}))
    assert not f["gopher_word_count_ok"] and not f["gopher_pass"]
    # the other rules still judge the short doc on their own terms
    assert f["gopher_stopword_ok"]
    long_doc = " ".join(["the fox and the dog"] * 25_000)  # 125k words
    f = _flags(pa.table({"text": [long_doc]}))
    assert not f["gopher_word_count_ok"]


def test_mean_word_length_rule():
    # 60 two-letter words -> mean length 2 < 3
    f = _flags(pa.table({"text": [" ".join(["ab"] * 60)]}))
    assert not f["gopher_mean_word_len_ok"]
    # 60 very long words -> mean length > 10
    f = _flags(pa.table({"text": [" ".join(["extraordinarily"] * 60)]}))
    assert not f["gopher_mean_word_len_ok"]


def test_symbol_ratio_rule():
    doc = CLEAN + " " + "#" * 20  # one 20-hash word: 20 symbols / ~56 words
    f = _flags(pa.table({"text": [doc]}))
    assert not f["gopher_symbol_ratio_ok"]
    # unicode ellipsis counts too
    doc = CLEAN + " " + " ".join(["…"] * 20)
    f = _flags(pa.table({"text": [doc]}))
    assert not f["gopher_symbol_ratio_ok"]


def test_bullet_and_ellipsis_line_rules():
    bullets = "\n".join(f"- item {i} of the list" for i in range(20))
    f = _flags(pa.table({"text": [bullets + "\n" + CLEAN]}))
    # 20/21 lines bulleted > 90%
    assert not f["gopher_bullet_ok"]
    trailing = "\n".join(f"the line {i} trails off..." for i in range(10))
    f = _flags(pa.table({"text": [trailing + "\n" + CLEAN]}))
    # 10/11 lines end with ellipsis > 30%
    assert not f["gopher_ellipsis_ok"]
    # a hyphenated word at line start is NOT a bullet ("-item" vs "- item")
    joined = "\n".join(f"-item{i} of the list" for i in range(20))
    f = _flags(pa.table({"text": [joined + "\n" + CLEAN]}))
    assert f["gopher_bullet_ok"]


def test_alpha_word_and_stopword_rules():
    nums = " ".join(str(i) for i in range(60))
    f = _flags(pa.table({"text": [nums]}))
    assert not f["gopher_alpha_ok"] and not f["gopher_stopword_ok"]
    # edge punctuation is stripped: "the," and "(and)" still count
    doc = ("the, (and) " + " ".join(f"word{i}" for i in range(55)))
    f = _flags(pa.table({"text": [doc]}))
    assert f["gopher_stopword_ok"] and f["gopher_alpha_ok"]
    # one stopword repeated is only ONE distinct hit -> fails min 2
    doc = "the " * 60
    f = _flags(pa.table({"text": [doc]}))
    assert not f["gopher_stopword_ok"]


def test_empty_and_null_docs():
    t = gopher_rules_batch(pa.table({"text": pa.array([None, ""],
                                                      pa.string())}))
    assert t.column("gopher_pass").to_pylist() == [False, False]


def test_threshold_knobs_override():
    t = gopher_rules_batch(pa.table({"text": ["five words here right now"]}),
                           min_words=3, min_stop_hits=0)
    assert t.column("gopher_word_count_ok")[0].as_py()
    assert t.column("gopher_stopword_ok")[0].as_py()


def test_compression_ratio_values():
    rep = "abcdef " * 500
    rng = np.random.default_rng(7)
    noise = "".join(chr(rng.integers(0x21, 0x7ff)) for _ in range(2000))
    t = compression_ratio_batch(pa.table({"text": [rep, CLEAN, noise, "", None]}))
    r = t.column("compression_ratio").to_pylist()
    assert r[0] < 0.05                 # pure repetition compresses away
    assert 0.2 < r[1] < 0.9            # natural text sits in the middle
    assert r[2] > r[1]                 # noise barely compresses
    assert r[3] == 1.0 and r[4] == 1.0  # empty/null -> neutral 1.0
    # exact formula pin: len(zlib(level 6)) / len(raw utf-8)
    raw = CLEAN.encode()
    assert r[1] == len(zlib.compress(raw, 6)) / len(raw)


def test_curation_gates(ray_session):
    import ray.data

    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents

    bullets = "\n".join(f"- item {i} of the list" for i in range(30))
    rep = "the spam phrase repeats again " * 40
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([CLEAN, bullets, rep], pa.string()),
    })
    cfg = CurationConfig(quality_min=0.0, near_dup=False, gopher=True,
                         compression_min=0.25, compression_max=0.95)
    out = curate_documents(ray.data.from_arrow(docs), cfg).to_pandas()
    # doc 2 fails the bullet rule; doc 3 compresses below 0.25
    assert sorted(out["doc_id"]) == [1]
    # the audit columns ride along on survivors
    assert out["gopher_pass"].all()
    assert ((out["compression_ratio"] >= 0.25)
            & (out["compression_ratio"] <= 0.95)).all()
    # knob override flows through gopher_kwargs
    cfg2 = CurationConfig(quality_min=0.0, near_dup=False, gopher=True,
                          gopher_kwargs={"max_bullet_line_frac": 1.0,
                                         "min_alpha_word_frac": 0.0,
                                         "min_mean_word_len": 0.0})
    out2 = curate_documents(ray.data.from_arrow(docs), cfg2).to_pandas()
    assert 2 in set(out2["doc_id"])


def test_c4_clean_batch_line_rules():
    from brdrq_ray.functions.text import c4_clean_batch

    doc = "\n".join([
        "This sentence ends with a period and has many words.",   # kept
        "short line.",                                            # <5 words
        "This line has no terminal punctuation at all here",      # no punct
        "Enable Javascript to view this page properly please.",   # phrase
        "We use cookies to improve your experience on this site.",  # phrase
        'He said "this quoted sentence is long enough to stay."',  # kept
        "Does this question have enough words to be retained?",   # kept
    ])
    t = c4_clean_batch(pa.table({"text": [doc]}))
    out = t.column("text")[0].as_py()
    assert out.count("\n") == 2 and out.startswith("This sentence")
    assert "cookies" not in out and "Javascript" not in out
    assert t.column("c4_lines_removed")[0].as_py() == 4
    assert t.column("c4_doc_ok")[0].as_py()  # 3 sentences survive


def test_c4_clean_batch_page_rules():
    from brdrq_ray.functions.text import c4_clean_batch

    good = ("The first sentence is here with enough words in it.\n"
            "The second sentence follows right behind it with more words.\n"
            "And the third sentence completes the minimum requirement too.")
    two = ("The first sentence is here with enough words in it.\n"
           "The second sentence follows right behind it with more words")
    lorem = good + "\nThis page contains Lorem Ipsum placeholder filler text."
    curly = good + "\nfunction f() { return 1; } ends with a period though."
    t = c4_clean_batch(pa.table({"text": [good, two, lorem, curly, "", None]}))
    assert t.column("c4_doc_ok").to_pylist() == [True, False, False, False,
                                                 False, False]


def test_c4_curation_stage(ray_session):
    import ray.data

    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents

    good = " ".join(["the quick brown fox jumps over the lazy dog and runs"]
                    * 6) + "."
    good = "\n".join([good, good, good])  # 3 long terminal-punct lines
    lorem = good + "\nlorem ipsum dolor sit amet filler text goes here now."
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([good, lorem], pa.string()),
    })
    cfg = CurationConfig(quality_min=0.0, near_dup=False, c4=True)
    out = curate_documents(ray.data.from_arrow(docs), cfg).to_pandas()
    assert sorted(out["doc_id"]) == [1]
    assert "c4_doc_ok" not in out.columns  # page flag consumed by the stage
    assert (out["c4_lines_removed"] == 0).all()


def test_gopher_alpha_rule_is_unicode():
    # a clean non-Latin doc must not fail the alphabetic rule (review
    # finding: ASCII-only [a-zA-Z] dropped every Russian/Greek doc)
    ru_words = ["собака", "бежит", "через", "поле", "утром", "весной"]
    doc = " ".join(ru_words * 10)
    f = _flags(pa.table({"text": [doc]}))
    assert f["gopher_alpha_ok"]


def test_c4_bare_end_quote_is_terminal():
    from brdrq_ray.functions.text import c4_clean_batch

    doc = ('He said "stop right there you fools"\n'
           "This sentence ends with a period and has many words.")
    t = c4_clean_batch(pa.table({"text": [doc]}))
    out = t.column("text")[0].as_py()
    assert out.startswith("He said")  # end-quote line kept
    assert t.column("c4_lines_removed")[0].as_py() == 0


def _gopher_brute(text, min_words=50, max_words=100_000,
                  min_mean_word_len=3.0, max_mean_word_len=10.0,
                  max_symbol_word_ratio=0.1, max_bullet_line_frac=0.9,
                  max_ellipsis_line_frac=0.3, min_alpha_word_frac=0.8,
                  min_stop_hits=2):
    """Per-row reference implementation (plain python) of gopher_rules_batch."""
    import re

    from brdrq_ray.functions.text import _GOPHER_STOPS, _WORD_EDGE_PUNCT

    text = text or ""
    words = text.split()
    nw = len(words)
    safe = max(nw, 1)
    mean_wlen = (sum(len(w) for w in words) / nw) if nw else 0.0
    symbols = text.count("#") + text.count("…") + len(
        re.findall(r"\.\.\.", text))
    lines = [ln.strip() for ln in text.split("\n")]
    n_lines = max(len(lines), 1)
    bullet = sum(bool(re.match(r"^(?:[•‣▪●]|[\-\*]\s)", ln)) for ln in lines)
    ellipsis = sum(bool(re.search(r"(?:\.\.\.|…)$", ln)) for ln in lines)
    stripped = [w.strip(_WORD_EDGE_PUNCT).lower() for w in words]
    alpha = sum(bool(re.search(r"[^\W\d_]", w)) for w in stripped)
    stops = len({w for w in stripped if w in _GOPHER_STOPS})
    return {
        "gopher_word_count_ok": min_words <= nw <= max_words,
        "gopher_mean_word_len_ok":
            min_mean_word_len <= mean_wlen <= max_mean_word_len,
        "gopher_symbol_ratio_ok": symbols / safe <= max_symbol_word_ratio,
        "gopher_bullet_ok": bullet / n_lines <= max_bullet_line_frac,
        "gopher_ellipsis_ok": ellipsis / n_lines <= max_ellipsis_line_frac,
        "gopher_alpha_ok": alpha / safe >= min_alpha_word_frac,
        "gopher_stopword_ok": stops >= min_stop_hits,
    }


def _c4_brute(text, min_line_words=5, min_sentences=3):
    import re

    from brdrq_ray.functions.text import _C4_LINE_PHRASES

    text = text or ""
    kept = []
    removed = 0
    for ln in text.split("\n"):
        ln = ln.strip()
        ok = (bool(re.search(r'[.!?"\'’”»]$', ln))
              and len(ln.split()) >= min_line_words
              and not any(p in ln.lower() for p in _C4_LINE_PHRASES))
        if ok:
            kept.append(ln)
        else:
            removed += 1
    out = "\n".join(kept)
    low = text.lower()
    ok_doc = (len(re.findall(r"[.!?]", out)) >= min_sentences
              and "lorem ipsum" not in low and "{" not in low
              and "}" not in low)
    return out, removed, ok_doc


def test_gopher_fuzz_vs_brute_force():
    from brdrq_ray.functions.text import gopher_rules_batch

    rng = np.random.default_rng(23)
    frags = ["the", "and", "of", "to", "…", "#", "- item", "...", "\n",
             "собака", "a", "xx", "extraordinary", "word", "12345", "! ?",
             "(and)", "•", "* x", "-dash", "…\n", "it."]
    docs = []
    for _ in range(120):
        n = int(rng.integers(0, 60))
        docs.append(" ".join(rng.choice(frags, size=n)))
    docs += ["", None]
    t = gopher_rules_batch(pa.table({"text": pa.array(docs, pa.string())}))
    for i, d in enumerate(docs):
        want = _gopher_brute(d)
        got = {k: t.column(k)[i].as_py() for k in want}
        assert got == want, (i, d, got, want)
        assert t.column("gopher_pass")[i].as_py() == all(want.values())


def test_c4_fuzz_vs_brute_force():
    from brdrq_ray.functions.text import c4_clean_batch

    rng = np.random.default_rng(29)
    lines = ["This is a long enough sentence to keep right here.",
             "short one.", "no terminal punct with many words right here",
             "Enable javascript now or else this breaks badly today.",
             'They shouted "hold the line until morning comes"',
             "lorem ipsum dolor sit amet and some more words here.",
             "function f() { return 1; } with a period.",
             "The next line trails off into the distance like this...",
             "", "Он сказал что всё будет хорошо и пошёл домой."]
    docs = []
    for _ in range(80):
        k = int(rng.integers(0, 8))
        docs.append("\n".join(rng.choice(lines, size=k)))
    docs += ["", None]
    t = c4_clean_batch(pa.table({"text": pa.array(docs, pa.string())}))
    for i, d in enumerate(docs):
        out, removed, ok = _c4_brute(d)
        assert t.column("text")[i].as_py() == out, (i, d)
        assert t.column("c4_lines_removed")[i].as_py() == removed
        assert t.column("c4_doc_ok")[i].as_py() == ok


def test_dedup_lines_within_doc():
    from brdrq_ray.functions.text import dedup_lines_within_doc_batch

    doc = "\n".join(["alpha line", "beta line", "alpha line", "",
                     "  alpha line  ", "", "gamma line"])
    t = dedup_lines_within_doc_batch(pa.table({"text": [doc, None, ""]}))
    out = t.column("text")[0].as_py()
    # trimmed-match repeats removed (incl. the padded one); blanks kept
    assert out == "alpha line\nbeta line\n\n\ngamma line"
    assert t.column("lines_deduped")[0].as_py() == 2
    assert t.column("text")[1].as_py() == "" and t.column("text")[2].as_py() == ""
    # keep_blank=False also collapses repeated blanks
    t2 = dedup_lines_within_doc_batch(pa.table({"text": [doc]}),
                                      keep_blank=False)
    assert t2.column("text")[0].as_py() == "alpha line\nbeta line\n\ngamma line"


def test_dedup_lines_brute_force_fuzz():
    from brdrq_ray.functions.text import dedup_lines_within_doc_batch

    def brute(text):
        seen, kept, removed = set(), [], 0
        for ln in (text or "").split("\n"):
            key = ln.strip()
            if key != "" and key in seen:
                removed += 1
            else:
                seen.add(key) if key != "" else None
                kept.append(ln)
        return "\n".join(kept), removed

    rng = np.random.default_rng(31)
    lines = ["a b", "  a b ", "c", "", "dd ee", "c ", "x y z"]
    docs = ["\n".join(rng.choice(lines, size=int(rng.integers(0, 12))))
            for _ in range(100)] + ["", None]
    t = dedup_lines_within_doc_batch(pa.table({"text": pa.array(docs, pa.string())}))
    for i, d in enumerate(docs):
        out, removed = brute(d)
        assert t.column("text")[i].as_py() == out, (i, d)
        assert t.column("lines_deduped")[i].as_py() == removed


def test_dedup_lines_curation_stage(ray_session):
    import ray.data

    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents

    doc = "\n".join([CLEAN, CLEAN, CLEAN.replace("fox", "hen")])
    docs = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array([doc])})
    cfg = CurationConfig(quality_min=0.0, near_dup=False, dedup_lines=True)
    out = curate_documents(ray.data.from_arrow(docs), cfg).to_pandas()
    assert out.loc[0, "lines_deduped"] == 1
    assert out.loc[0, "text"].count("fox") == 1
