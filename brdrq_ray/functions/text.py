"""Text-analysis operators for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

Beyond the reference's own surface (its only text ops are the substring
search M11 and name sanitization, SURVEY.md section 2.8) — these are the
first-class data-pipeline operators the engine adds for the 100 TB use case.

All stages are vectorized per batch; the language-ID stage is a callable
class (actor pool) so its n-gram profiles are built once per actor, not per
batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# a BPE-ish pre-tokenization regex (GPT-2 style pattern family, public):
# words, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")

_STOPWORDS = {"the", "and", "of", "a", "to", "in", "is", "on", "for", "with",
              "by", "at", "or", "from", "as", "an", "be", "this", "that", "it"}


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """whitespace token count + BPE-ish regex token count (vectorized via
    pandas str ops)."""
    s = batch.column(col).to_pandas().fillna("")
    ws = s.str.split().str.len().fillna(0).astype("int64")
    # count, not findall: same number without materializing the match lists
    bpe = s.str.count(_BPE_RE).fillna(0).astype("int64")
    return (batch
            .append_column("ws_tokens", pa.array(ws.to_numpy(), pa.int64()))
            .append_column("bpe_tokens", pa.array(bpe.to_numpy(), pa.int64())))


def quality_score_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Heuristic quality features + composite score in [0, 1]:
    length, punctuation ratio, stopword ratio, mean word length. The score is
    a fixed deterministic formula (documented here, not tuned)."""
    s = batch.column(col).to_pandas().fillna("")
    n_chars = s.str.len().astype("float64")
    words = s.str.split()
    n_words = words.str.len().fillna(0).astype("float64")
    mean_wlen = (n_chars - (n_words - 1).clip(lower=0)) / n_words.replace(0, np.nan)
    mean_wlen = mean_wlen.fillna(0.0)
    punct = s.str.count(r"[^\w\s]").astype("float64")
    punct_ratio = (punct / n_chars.replace(0, np.nan)).fillna(0.0)
    # vectorized stopword ratio, same semantics as the per-row set lookup:
    # split tokens (punctuation attached), lowercase, exact membership
    exploded = words.explode()
    stop_counts = (exploded.str.lower().isin(_STOPWORDS)
                   .groupby(level=0).sum().reindex(s.index, fill_value=0))
    stop_ratio = (stop_counts / n_words.replace(0, np.nan)).fillna(0.0)
    length_term = np.clip(n_words / 50.0, 0, 1)
    punct_term = 1.0 - np.clip(punct_ratio * 5.0, 0, 1)
    stop_term = np.clip(stop_ratio * 3.0, 0, 1) * 0.5 + 0.5
    wlen_term = 1.0 - np.clip(np.abs(mean_wlen - 5.0) / 5.0, 0, 1)
    score = 0.35 * length_term + 0.2 * punct_term + 0.15 * stop_term + 0.3 * wlen_term
    return (batch
            .append_column("n_words", pa.array(n_words.astype("int64").to_numpy(), pa.int64()))
            .append_column("punct_ratio", pa.array(punct_ratio.to_numpy(), pa.float64()))
            .append_column("stopword_ratio", pa.array(np.asarray(stop_ratio, dtype=np.float64), pa.float64()))
            .append_column("mean_word_len", pa.array(mean_wlen.to_numpy(), pa.float64()))
            .append_column("quality_score", pa.array(np.asarray(score, dtype=np.float64), pa.float64())))


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of the whitespace-normalized lowercased text
    (SQL-oracle-able: md5(lower(trim(text))) after regexp_replace) plus a
    64-bit rolling polynomial hash (rows-only)."""
    s = batch.column(col).to_pandas().fillna("")
    norm = s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in norm]
    # base-256 polynomial hash mod Mersenne-61 == the byte string read as one
    # big-endian integer, reduced mod M — int.from_bytes + bigint mod are C
    # paths, removing the r2 per-character Python loop (~40x on long docs).
    # SEMANTIC CHANGE vs r2 (intentional, SEMANTICS.md section 18): r2 used
    # base 257, so r3+ values differ from any r2-persisted fingerprints; the
    # length is mixed in below so texts differing only by leading NUL bytes
    # ('\x00abc' vs 'abc' — invisible to a base-256 integer) stay distinct.
    MOD = (1 << 61) - 1
    rolls = [(int.from_bytes(t.encode(), "big")
              + (len(t) << 32)) % MOD for t in norm]
    return (batch
            .append_column("fingerprint_md5", pa.array(md5s, pa.string()))
            .append_column("fingerprint_roll", pa.array(rolls, pa.int64())))


class LangIdStage:
    """Language ID by character-trigram profile similarity — a stateful actor
    stage: profiles are built once in __init__ (the 'model load'), batches are
    scored in __call__. Deterministic; the tiny built-in profiles are for the
    pipeline shape, not linguistic accuracy."""

    PROFILES = {
        "en": "the and ing ion tio ent for ate ter est ers ble ight of to",
        "nl": "de het een van en ij aan sch lijk heid ing oor teit",
        "fr": "le la les des une est tion ment que pour avec dans",
        "de": "der die das und ein ich sch ung den von mit ist",
    }

    def __init__(self):
        # profiles as SORTED 24-bit byte-trigram code arrays (built once per
        # actor). Profiles are pure ASCII, so byte trigrams == char trigrams:
        # in valid UTF-8 any 3-byte window matching 3 ASCII bytes is a real
        # 3-char substring (continuation bytes are >= 0x80).
        import numpy as np
        self.langs: list[str] = []
        self.codes: list[np.ndarray] = []
        self.sizes: list[int] = []
        for lang, text in self.PROFILES.items():
            grams = set()
            for w in text.split():
                padded = f" {w} "
                grams |= {padded[i:i + 3] for i in range(len(padded) - 2)}
            arr = np.array(sorted(
                (g[0].encode()[0] << 16) | (g[1].encode()[0] << 8)
                | g[2].encode()[0] for g in grams), dtype=np.int32)
            self.langs.append(lang)
            self.codes.append(arr)
            self.sizes.append(max(len(grams), 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        n = len(batch)
        low = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        # zero-copy utf-8 bytes straight from the Arrow buffers
        chunks = low.chunks if isinstance(low, pa.ChunkedArray) else [low]
        parts, lens_parts = [], []
        for ch in chunks:
            if len(ch) == 0:
                continue
            # large_string (which Ray Data / pc.utf8_lower can produce for
            # big blocks) carries int64 offsets — reading them as int32 would
            # silently misparse lens and emit garbage predictions
            off_dtype = (np.int64 if pa.types.is_large_string(ch.type)
                         else np.int32)
            offs = np.frombuffer(ch.buffers()[1], dtype=off_dtype)[
                ch.offset:ch.offset + len(ch) + 1]
            data = np.frombuffer(ch.buffers()[2] or b"", dtype=np.uint8)
            parts.append(data[offs[0]:offs[-1]])
            lens_parts.append(np.diff(offs).astype(np.int64))
        lens = (np.concatenate(lens_parts) if lens_parts
                else np.empty(0, np.int64))
        if n == 0 or int(lens.sum()) == 0:
            return (batch
                    .append_column("lang_pred", pa.array(["und"] * n))
                    .append_column("lang_conf", pa.array([0.0] * n)))
        arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
        doc_of = np.repeat(np.arange(n), lens)
        # 24-bit trigram code at every byte position whose window stays
        # inside ONE document
        if len(arr) >= 3:
            codes = ((arr[:-2].astype(np.int32) << 16)
                     | (arr[1:-1].astype(np.int32) << 8)
                     | arr[2:].astype(np.int32))
            valid = doc_of[:-2] == doc_of[2:]
            codes, cdoc = codes[valid], doc_of[:-2][valid]
        else:
            codes = np.empty(0, np.int32)
            cdoc = np.empty(0, np.int64)
        # DISTINCT (doc, gram) pairs ONCE (set-intersection semantics), then
        # each language probes the unique grams via searchsorted against its
        # small sorted profile — no per-language sort of the corpus
        scores = np.zeros((len(self.langs), n))
        if len(codes):
            upair = np.unique(cdoc * np.int64(1 << 24) + codes)
            ucodes = (upair & np.int64((1 << 24) - 1)).astype(np.int32)
            udoc = (upair >> np.int64(24)).astype(np.int64)
            for li, prof in enumerate(self.codes):
                idx = np.searchsorted(prof, ucodes)
                idx[idx == len(prof)] = 0
                sel = prof[idx] == ucodes
                if sel.any():
                    scores[li] = np.bincount(udoc[sel], minlength=n) \
                        / self.sizes[li]
        best = scores.argmax(axis=0)          # first max wins = dict order
        best_s = scores[best, np.arange(n)]
        langs = np.where(best_s > 0.0, np.array(self.langs)[best], "und")
        return (batch
                .append_column("lang_pred", pa.array(langs.tolist(), pa.string()))
                .append_column("lang_conf",
                               pa.array(np.round(best_s, 6), pa.float64())))


def analyze_documents(ds, col: str = "text"):
    """documents Dataset -> + token counts, quality features, fingerprints,
    language prediction. Stateless stages as tasks, language ID as an actor
    pool."""
    out = (ds.map_batches(lambda b: token_count_batch(b, col), batch_format="pyarrow")
             .map_batches(lambda b: quality_score_batch(b, col), batch_format="pyarrow")
             .map_batches(lambda b: fingerprint_batch(b, col), batch_format="pyarrow")
             .map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4)))
    return out


def normalize_text_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Canonical text normalization (training-data cleaning staple):
    lowercase, collapse whitespace runs to single spaces, strip. Vectorized
    pyarrow compute — no per-row Python."""
    import pyarrow.compute as pc

    t = pc.utf8_lower(batch.column(col))
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column("text_norm", t)


def hash_split_batch(batch: pa.Table, id_col: str = "doc_id",
                     val_pct: int = 10, test_pct: int = 10) -> pa.Table:
    """Deterministic train/val/test assignment by content hash of the id —
    the split is a pure function of the row (stable across runs, machines
    and partitionings; no RNG, no shuffle). Bucket = first 8 hex chars of
    md5(id) mod 100; [0, test) -> test, [test, test+val) -> val, rest train."""
    import hashlib

    ids = batch.column(id_col).to_pylist()
    buckets = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
               for i in ids]
    split = ["test" if b < test_pct
             else "val" if b < test_pct + val_pct
             else "train" for b in buckets]
    return (batch.append_column("split_bucket", pa.array(buckets, pa.int64()))
                 .append_column("split", pa.array(split, pa.string())))


def pack_sequences(ds, token_budget: int = 2048, id_col: str = "doc_id",
                   col: str = "text", n_buckets: int = 64):
    """Greedy sequence packing (LLM-pretraining staple): assign documents to
    fixed token-budget training sequences. Distributed shape: hash-bucket the
    corpus (one shuffle), sort by id within the bucket (deterministic — no
    dependence on block order), then first-fit-decreasing-free greedy pack in
    arrival order. Documents longer than the budget get a sequence of their
    own (the trainer chunks them downstream). Returns
    (doc_id, ws_tokens, seq_id, seq_offset) — seq_id is globally unique
    ('<bucket>-<k>') and seq_offset is the document's token start inside it."""
    import pandas as pd
    import pyarrow.compute as pc

    from .vhash import bucket_i32

    def add_tokens_and_bucket(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.utf8_split_whitespace(batch.column(col)))
        # NOTE the bucket id leaks into the output seq_id ('<bucket>-<k>'), so
        # changing this hash changes seq ids (golden regenerated with it)
        b = bucket_i32(batch.column(id_col).cast(pa.string()), n_buckets)
        return (batch.select([id_col])
                .append_column("ws_tokens", pc.cast(toks, pa.int64()))
                .append_column("b", b))

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        bucket = int(g["b"].iloc[0])
        seq_ids, offsets = [], []
        k, fill = 0, 0
        for t in g["ws_tokens"].to_numpy():
            t = int(t)
            if fill > 0 and fill + t > token_budget:
                k += 1
                fill = 0
            seq_ids.append(f"{bucket}-{k}")
            offsets.append(fill)
            fill += t
            if fill >= token_budget:
                k += 1
                fill = 0
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "ws_tokens": g["ws_tokens"].to_numpy(),
                             "seq_id": seq_ids,
                             "seq_offset": pd.array(offsets, dtype="int64")})

    return (ds.map_batches(add_tokens_and_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(pack_bucket, batch_format="pandas"))


# --- PII redaction ----------------------------------------------------------

#: compiled once at module import; every pattern is RE2-compatible so the
#: whole pass runs inside Arrow's C++ regex kernel (no Python per row)
_PII_PATTERNS = [
    # order matters: url first (it may contain @, digits, dots), then email,
    # then ipv4/iban, PHONE LAST (its loose digit-run shape would otherwise
    # swallow IPv4s and parts of URLs)
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("iban", r"\b[A-Z]{2}[0-9]{2}[A-Za-z0-9]{10,30}\b", "<IBAN>"),
    ("phone", r"\+?[0-9][0-9 ()./-]{7,}[0-9]", "<PHONE>"),
]


def redact_pii_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Redact common PII shapes (emails, phone numbers, IPv4s, URLs, IBANs)
    with typed placeholders — the standard scrubbing stage of a training-data
    pipeline. Vectorized: one pyarrow C++ regex pass per pattern over the
    whole column; per-pattern hit counts come back as columns so a pipeline
    can filter or audit by PII density. Patterns apply in the module-level
    order (urls/emails/IPs before the loose phone shape)."""
    import pyarrow.compute as pc

    t = pc.fill_null(batch.column(col), "")
    counts = {}
    for name, pat, repl in _PII_PATTERNS:
        hits = pc.count_substring_regex(t, pat)
        counts[f"pii_{name}"] = hits
        t = pc.replace_substring_regex(t, pat, repl)
    out = batch.append_column("text_redacted", t)
    for cname, arr in counts.items():
        out = out.append_column(cname, arr)
    return out


# --- boilerplate-line removal (C4/CCNet-style line-level dedup) --------------

def remove_boilerplate_lines(ds, col: str = "text", id_col: str = "doc_id",
                             min_docs: int = 5, n_buckets: int = 64,
                             broadcast_limit: int = 4_000_000):
    """Remove lines that occur in >= ``min_docs`` distinct documents — the
    C4/CCNet line-level dedup that strips cookie banners, nav bars and
    footers from a web corpus. The text column is rewritten in place
    (kept lines keep their original, untrimmed bytes; matching is on the
    TRIMMED line; whitespace-only lines are never counted or removed).

    Scale shape: pass 1 computes per-batch partial doc-frequencies of line
    hashes (distinct (doc, line) within a batch is exact — a document lives
    in one row), then one groupby-sum over line hashes; the frequent-line
    set is bounded by total_lines/min_docs. Pass 2 is hybrid: at or below
    ``broadcast_limit`` frequent lines the sorted hash array ships once via
    ray.put and every batch filters its lines with one searchsorted (zero
    shuffles); above it the corpus explodes to lines, the frequent set is
    anti-joined out distributedly (relational.semi_join), documents are
    reassembled by a bucketed groupby and the cleaned text joins back with
    the platform hash join — no driver-side set at any size.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .vhash import bucket_i32, hash64

    def line_freq(batch: pa.Table) -> pa.Table:
        s = batch.column(col).to_pandas().fillna("")
        lines = s.str.split("\n").explode().str.strip()
        mask = lines.notna().to_numpy() & (lines != "").to_numpy()
        if not mask.any():
            return pa.table({"line_hash": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        h = hash64(lines.to_numpy(dtype=object)[mask]).view(np.int64)
        doc = lines.index.to_numpy()[mask].astype(np.int64)
        order = np.lexsort((h, doc))
        hd, dd = h[order], doc[order]
        first = np.ones(len(hd), bool)
        first[1:] = (dd[1:] != dd[:-1]) | (hd[1:] != hd[:-1])
        uh, cnt = np.unique(hd[first], return_counts=True)
        return pa.table({"line_hash": pa.array(uh, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    bad = (ds.map_batches(line_freq, batch_format="pyarrow")
           .groupby("line_hash").aggregate(Sum("cnt", alias_name="cnt"))
           .map_batches(lambda t: t.filter(
               pc.greater_equal(t.column("cnt"), min_docs))
               .select(["line_hash"]), batch_format="pyarrow")
           .materialize())
    n_bad = bad.count()
    if n_bad == 0:
        return ds

    if n_bad <= broadcast_limit:
        chunks = [b.column("line_hash").to_numpy(zero_copy_only=False)
                  for b in bad.iter_batches(batch_format="pyarrow")]
        bad_ref = ray.put(np.sort(np.concatenate(chunks)))

        class StripLines:
            def __init__(self):
                self.bad = ray.get(bad_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                s = batch.column(col).to_pandas().fillna("")
                lines = s.str.split("\n").explode()
                stripped = lines.str.strip().fillna("")
                h = hash64(stripped.to_numpy(dtype=object)).view(np.int64)
                pos = np.searchsorted(self.bad, h)
                pos[pos == len(self.bad)] = 0
                is_bad = (self.bad[pos] == h) & (stripped != "").to_numpy()
                keep = lines[~is_bad].fillna("")
                joined = keep.groupby(level=0).agg("\n".join)
                out = pd.Series(np.full(len(s), "", dtype=object))
                out.update(joined)
                i = batch.schema.get_field_index(col)
                return batch.set_column(i, col,
                                        pa.array(out.tolist(), pa.string()))

        return ds.map_batches(StripLines, batch_format="pyarrow",
                              concurrency=_pool())

    # ---- distributed leg (frequent-line set too large for any broadcast) ---
    from .relational import semi_join

    def explode_lines(batch: pa.Table) -> pa.Table:
        s = batch.column(col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lines = s.str.split("\n").explode().fillna("")
        doc = lines.index.to_numpy().astype(np.int64)
        cnts = np.bincount(doc, minlength=len(s))
        line_idx = (np.arange(len(doc), dtype=np.int64)
                    - np.repeat(np.cumsum(cnts) - cnts, cnts))
        stripped = lines.str.strip()
        h = hash64(stripped.to_numpy(dtype=object)).view(np.int64)
        # whitespace-only lines are structure, not boilerplate: map them all
        # to one sentinel hash. line_freq never counts empty lines, so the
        # sentinel (like any fixed value) is absent from `bad` up to a 2^-64
        # hash collision — the same risk class every hash in this file has.
        h = np.where((stripped == "").to_numpy(), np.int64(0), h)
        return pa.table({id_col: pa.array(ids[doc]),
                         "line_idx": pa.array(line_idx, pa.int64()),
                         "line": pa.array(lines.tolist(), pa.string()),
                         "line_hash": pa.array(h, pa.int64())})

    kept = semi_join(ds.map_batches(explode_lines, batch_format="pyarrow"),
                     bad, on="line_hash", anti=True, n_buckets=n_buckets)

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "db", bucket_i32(t.column(id_col).cast(pa.string()), n_buckets))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_idx"])
        joined = g.groupby(id_col, sort=False)["line"].agg("\n".join)
        return pd.DataFrame({id_col: joined.index.to_numpy(),
                             "__clean": joined.to_numpy()})

    cleaned = (kept.map_batches(add_doc_bucket, batch_format="pyarrow")
               .groupby("db").map_groups(reassemble, batch_format="pandas"))

    # join the cleaned text back onto the full corpus (docs whose every line
    # was boilerplate fall out of `cleaned` and become empty strings)
    from .relational import lookup_join

    joined = lookup_join(ds.drop_columns([col]), cleaned, on=id_col,
                         value_col="__clean", n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        out = t.append_column(col, pc.fill_null(t.column("__clean"), ""))
        return out.drop_columns(["__clean"])

    return joined.map_batches(finish, batch_format="pyarrow")


# --- repeated-passage removal (cross-doc k-gram passage dedup) ---------------

def _excise_marks(texts, mdoc: np.ndarray, mpos: np.ndarray, k: int):
    """Rewrite each text with the word windows ``[p, p+k)`` removed for
    every marked (doc ``mdoc[i]``, start position ``mpos[i]``) pair
    (overlaps merge); docs with no marks keep their ORIGINAL bytes.
    Returns (texts_out, n_removed_per_doc). Vectorized: one interval-delta
    cumsum over the exploded word axis, one grouped join over the touched
    docs only."""
    import pandas as pd

    n = len(texts)
    if len(mdoc) == 0:
        return list(texts), np.zeros(n, dtype=np.int64)
    orig_words = (pd.Series(np.asarray(texts, dtype=object))
                  .fillna("").astype(str).str.split())
    lens = orig_words.str.len().to_numpy(dtype=np.int64)
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total_words = int(lens.sum())
    delta = np.zeros(total_words + 1, dtype=np.int64)
    gs = doc_start[mdoc] + mpos
    np.add.at(delta, gs, 1)
    np.add.at(delta, gs + k, -1)  # pos <= len-k, so gs+k <= doc end
    removed = np.cumsum(delta[:-1]) > 0
    word_doc = np.repeat(np.arange(n), lens)
    n_removed = np.bincount(word_doc[removed], minlength=n).astype(np.int64)
    touched = n_removed > 0

    w = orig_words.explode()
    wv = w[w.notna().to_numpy()]  # index == doc idx, aligned with word axis
    joined = wv[~removed].groupby(level=0).agg(" ".join)
    out = list(texts)
    for d in np.nonzero(touched)[0]:
        out[d] = joined.get(d, "")
    return out, n_removed


def remove_repeated_passages(ds, col: str = "text", id_col: str = "doc_id",
                             k: int = 10, min_docs: int = 2,
                             n_buckets: int = 64,
                             broadcast_limit: int = 4_000_000):
    """Remove word passages that repeat across >= ``min_docs`` distinct
    documents — the cross-document repeated-substring dedup of Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better"),
    approximated at word-k-gram granularity: every position whose k-word
    window (lowercased) occurs in >= min_docs docs is excised ([p, p+k),
    overlapping windows merge into one passage), and the surviving words
    are re-joined with single spaces. Docs with no repeated passage keep
    their original bytes; a ``passage_words_removed`` audit column counts
    excised words per doc. Complements ``remove_boilerplate_lines`` (line
    granularity) and exact/MinHash dedup (whole-doc granularity).

    Scale shape mirrors the boilerplate op: pass 1 = per-batch partial
    doc-frequencies of gram hashes (distinct per doc) -> one groupby-sum;
    the frequent set is bounded by total_grams/min_docs. Pass 2 hybrid: at
    or below ``broadcast_limit`` frequent grams the sorted hash array ships
    once via ray.put and every batch marks+excises locally (zero shuffles);
    above it the positional gram table is semi-joined against the frequent
    set distributedly, marked positions reassemble per doc (bucketed
    groupby, bounded by the duplication volume — NOT the corpus), and the
    packed marks join back via the lookup join. Deterministic and
    batching-independent (doc frequency is exact: a doc lives in one row).
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .dedup import _positional_grams
    from .vhash import bucket_i32

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def gram_freq(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_numpy(zero_copy_only=False)
        d, _, h, _, _ = _positional_grams(texts, k)
        if len(h) == 0:
            return pa.table({"gram_hash": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        hv = h.view(np.int64)
        order = np.lexsort((hv, d))
        hd, dd = hv[order], d[order]
        first = np.ones(len(hd), bool)
        first[1:] = (dd[1:] != dd[:-1]) | (hd[1:] != hd[:-1])
        uh, cnt = np.unique(hd[first], return_counts=True)
        return pa.table({"gram_hash": pa.array(uh, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    bad = (ds.map_batches(gram_freq, batch_format="pyarrow")
           .groupby("gram_hash").aggregate(Sum("cnt", alias_name="cnt"))
           .map_batches(lambda t: t.filter(
               pc.greater_equal(t.column("cnt"), min_docs))
               .select(["gram_hash"]), batch_format="pyarrow")
           .materialize())

    if bad.count() == 0:
        return ds.map_batches(
            lambda t: t.append_column(
                "passage_words_removed",
                pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow")

    if bad.count() <= broadcast_limit:
        chunks = [b.column("gram_hash").to_numpy(zero_copy_only=False)
                  for b in bad.iter_batches(batch_format="pyarrow")]
        bad_ref = ray.put(np.sort(np.concatenate(chunks)))

        class ExcisePassages:
            def __init__(self):
                self.bad = ray.get(bad_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                texts = batch.column(col).to_numpy(zero_copy_only=False)
                d, pos, h, _, _ = _positional_grams(texts, k)
                hv = h.view(np.int64)
                if len(hv):
                    idx = np.searchsorted(self.bad, hv)
                    idx[idx == len(self.bad)] = 0
                    marked = self.bad[idx] == hv
                else:
                    marked = np.zeros(0, bool)
                out, n_removed = _excise_marks(texts, d[marked], pos[marked], k)
                i = batch.schema.get_field_index(col)
                return (batch.set_column(i, col, pa.array(out, pa.string()))
                        .append_column("passage_words_removed",
                                       pa.array(n_removed)))

        return ds.map_batches(ExcisePassages, batch_format="pyarrow",
                              concurrency=_pool())

    # ---- distributed leg (frequent-gram set too large for any broadcast) ---
    from .relational import lookup_join, semi_join

    def explode_grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d, pos, h, _, _ = _positional_grams(texts, k)
        return pa.table({id_col: pa.array(ids[d]),
                         "pos": pa.array(pos, pa.int64()),
                         "gram_hash": pa.array(h.view(np.int64), pa.int64())})

    marked = semi_join(ds.map_batches(explode_grams, batch_format="pyarrow"),
                       bad, on="gram_hash")

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "db", bucket_i32(t.column(id_col).cast(pa.string()), n_buckets))

    def pack_marks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"])
        packed = g.groupby(id_col, sort=False)["pos"].agg(
            lambda p: ",".join(map(str, p)))
        return pd.DataFrame({id_col: packed.index.to_numpy(),
                             "__marks": packed.to_numpy()})

    packs = (marked.map_batches(add_doc_bucket, batch_format="pyarrow")
             .groupby("db").map_groups(pack_marks, batch_format="pandas"))
    joined = lookup_join(ds, packs, on=id_col, value_col="__marks",
                         n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_numpy(zero_copy_only=False)
        marks = t.column("__marks").to_numpy(zero_copy_only=False)
        per_doc = [(i, np.array(m.split(","), dtype=np.int64))
                   for i, m in enumerate(marks) if isinstance(m, str) and m]
        if per_doc:
            mdoc = np.repeat(np.array([i for i, _ in per_doc], np.int64),
                             [len(p) for _, p in per_doc])
            mpos = np.concatenate([p for _, p in per_doc])
        else:
            mdoc = mpos = np.empty(0, np.int64)
        out, n_removed = _excise_marks(texts, mdoc, mpos, k)
        i = t.schema.get_field_index(col)
        return (t.set_column(i, col, pa.array(out, pa.string()))
                .append_column("passage_words_removed", pa.array(n_removed))
                .drop_columns(["__marks"]))

    return joined.map_batches(finish, batch_format="pyarrow")


def repetition_ratio_batch(batch: pa.Table, col: str = "text",
                           k: int = 3) -> pa.Table:
    """Within-document repetition signal: 1 - distinct/total word k-gram
    windows (0 = no repeated k-gram, -> 1 for a document looping one
    phrase; docs with fewer than k words score 0). The standard
    quality-filter companion to the corpus-level dedups — repetitive docs
    (keyword stuffing, generated spam) score high and get filtered.
    Vectorized on the MinHash sketcher's shingle kernel (multiset + set
    counts per doc, no per-window Python)."""
    from .dedup import _shingle_hashes

    texts = batch.column(col).to_numpy(zero_copy_only=False)
    n = len(texts)
    d_all, _ = _shingle_hashes(texts, k, dedupe=False)
    d_set, _ = _shingle_hashes(texts, k)
    total = np.bincount(d_all, minlength=n).astype(np.float64)
    distinct = np.bincount(d_set, minlength=n).astype(np.float64)
    ratio = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1.0), 0.0)
    return batch.append_column("repetition_ratio",
                               pa.array(ratio, pa.float64()))


#: Gopher's required-stopword list (Rae et al. 2021, appendix A1.1): a doc
#: must contain at least 2 DISTINCT members to pass the stopword rule.
_GOPHER_STOPS = frozenset(
    {"the", "be", "to", "of", "and", "that", "have", "with"})

#: punctuation stripped from word edges before the stopword / alpha checks
#: ("the," counts as "the"); kept as an explicit constant so the rule is
#: reproducible.
_WORD_EDGE_PUNCT = "\"'`.,;:!?()[]{}<>-—–*#%&/\\|~^+="


def gopher_rules_batch(batch: pa.Table, col: str = "text", *,
                       min_words: int = 50, max_words: int = 100_000,
                       min_mean_word_len: float = 3.0,
                       max_mean_word_len: float = 10.0,
                       max_symbol_word_ratio: float = 0.1,
                       max_bullet_line_frac: float = 0.9,
                       max_ellipsis_line_frac: float = 0.3,
                       min_alpha_word_frac: float = 0.8,
                       min_stop_hits: int = 2) -> pa.Table:
    """Gopher repetition-free quality rules (Rae et al. 2021, appendix A1.1),
    the published defaults as keyword knobs. Appends one boolean audit column
    per rule plus ``gopher_pass`` (AND of all):

    - word count in [50, 100,000]
    - mean word length in [3, 10] characters
    - symbol-to-word ratio ('#' or ellipsis) <= 0.1
    - <= 90% of lines start with a bullet character
    - <= 30% of lines end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct members of the 8-word required-stopword list

    Vectorized with pandas str kernels (explode + groupby(level=0), same
    pattern as quality_score_batch); word-edge punctuation is stripped before
    the stopword / alphabetic checks so "the," counts as "the". Docs with no
    words fail the word-count rule and score 0 on the fraction rules."""
    import pandas as pd

    s = batch.column(col).to_pandas().fillna("")
    idx = s.index
    words = s.str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    nw = n_words.to_numpy()
    safe_nw = np.maximum(nw, 1).astype(np.float64)

    exploded = words.explode()
    # astype first: an all-null batch leaves str.len() object-dtype, and
    # fillna on an object block trips the pandas downcasting FutureWarning
    wlen = exploded.str.len().astype("float64")
    mean_wlen = (wlen.groupby(level=0).mean()
                 .reindex(idx, fill_value=0.0).fillna(0.0).to_numpy())

    # symbols: '#' plus ellipsis in either spelling; '...' occurrences are
    # counted non-overlapping, like the paper's tokenizer would see them
    symbols = (s.str.count("#") + s.str.count("…")
               + s.str.count(r"\.\.\.")).to_numpy().astype(np.float64)
    symbol_ratio = symbols / safe_nw

    lines = s.str.split("\n").explode().str.strip()
    n_lines = (lines.groupby(level=0).size()
               .reindex(idx, fill_value=0).to_numpy().astype(np.float64))
    # bare bullet glyphs count on their own; '-'/'*' need a following space
    # so hyphenated words ("-item") are not miscounted as bullets
    # .eq(True) instead of .fillna(False): object-dtype bool + NaN would hit
    # the pandas fillna-downcasting FutureWarning; eq maps NaN -> False in
    # bool dtype directly
    bullet = lines.str.match(r"^(?:[•‣▪●]|[\-\*]\s)")
    bullet_frac = (bullet.eq(True).groupby(level=0).sum()
                   .reindex(idx, fill_value=0).to_numpy()
                   / np.maximum(n_lines, 1.0))
    ellipsis = lines.str.contains(r"(?:\.\.\.|…)$", regex=True)
    ellipsis_frac = (ellipsis.eq(True).groupby(level=0).sum()
                     .reindex(idx, fill_value=0).to_numpy()
                     / np.maximum(n_lines, 1.0))

    stripped = exploded.str.strip(_WORD_EDGE_PUNCT).str.lower()
    # Unicode alphabetic (the published rule says "alphabetic character",
    # not ASCII): [^\W\d_] = any word character that is not a digit or _
    alpha = stripped.str.contains(r"[^\W\d_]", regex=True)
    alpha_frac = (alpha.eq(True).groupby(level=0).sum()
                  .reindex(idx, fill_value=0).to_numpy() / safe_nw)
    stop_hits = (stripped.where(stripped.isin(_GOPHER_STOPS))
                 .groupby(level=0).nunique()
                 .reindex(idx, fill_value=0).to_numpy())

    rules = {
        "gopher_word_count_ok": (nw >= min_words) & (nw <= max_words),
        "gopher_mean_word_len_ok": ((mean_wlen >= min_mean_word_len)
                                    & (mean_wlen <= max_mean_word_len)),
        "gopher_symbol_ratio_ok": symbol_ratio <= max_symbol_word_ratio,
        "gopher_bullet_ok": bullet_frac <= max_bullet_line_frac,
        "gopher_ellipsis_ok": ellipsis_frac <= max_ellipsis_line_frac,
        "gopher_alpha_ok": alpha_frac >= min_alpha_word_frac,
        "gopher_stopword_ok": stop_hits >= min_stop_hits,
    }
    out = batch
    passed = np.ones(len(s), dtype=bool)
    for name, flag in rules.items():
        flag = np.asarray(flag, dtype=bool)
        passed &= flag
        out = out.append_column(name, pa.array(flag, pa.bool_()))
    return out.append_column("gopher_pass", pa.array(passed, pa.bool_()))


#: C4's banned line phrases (Raffel et al. 2020 section 2.2: the Javascript
#: rule plus the cookie/policy notice list) — any line containing one,
#: case-insensitively, is dropped.
_C4_LINE_PHRASES = ("javascript", "terms of use", "privacy policy",
                    "cookie policy", "uses cookies", "use of cookies",
                    "use cookies")


def c4_clean_batch(batch: pa.Table, col: str = "text", *,
                   min_line_words: int = 5, min_sentences: int = 3,
                   banned_line_phrases: tuple = _C4_LINE_PHRASES,
                   banned_doc_substrings: tuple = ("lorem ipsum", "{", "}"),
                   ) -> pa.Table:
    """C4 line/page cleaning (Raffel et al. 2020, section 2.2), the published
    rules as knobs. Line level — a line is kept only if it ends in a terminal
    punctuation mark (.!?" or a closing quote), has >= 5 words, and contains
    none of the banned phrases (Javascript + the cookie/policy list),
    matched case-insensitively. Page level — ``c4_doc_ok`` is False when the
    cleaned text has fewer than 3 sentences (terminal-punctuation count) or
    the ORIGINAL text contains "lorem ipsum" (case-insensitive) or a curly
    bracket. The text column is rewritten in place (kept lines keep their
    trimmed bytes, joined by newlines); ``c4_lines_removed`` counts dropped
    lines per doc. Stateless and per-batch — one vectorized explode/groupby,
    no shuffle; pages are dropped by filtering on c4_doc_ok downstream."""
    import pandas as pd

    s = batch.column(col).to_pandas().fillna("")
    idx = s.index
    lines = s.str.split("\n").explode()
    st = lines.str.strip().fillna("")
    low = st.str.lower()
    # terminal = period / ! / ? / an END QUOTATION MARK itself (the paper
    # lists the end quote as terminal punctuation in its own right)
    ok = st.str.contains(r'[.!?"\'’”»]$', regex=True).eq(True)
    ok &= st.str.split().str.len().fillna(0) >= min_line_words
    for phrase in banned_line_phrases:
        ok &= ~low.str.contains(phrase.lower(), regex=False)
    n_lines = st.groupby(level=0).size().reindex(idx, fill_value=0)
    ok_arr = ok.to_numpy(dtype=bool)
    kept = st[ok_arr]
    joined = (kept.groupby(level=0).agg("\n".join)
              .reindex(idx, fill_value="").fillna(""))
    n_kept = (pd.Series(ok_arr, index=st.index).groupby(level=0).sum()
              .reindex(idx, fill_value=0))
    removed = (n_lines - n_kept).astype("int64")

    sentences = joined.str.count(r"[.!?]")
    doc_ok = (sentences >= min_sentences).to_numpy(dtype=bool)
    s_low = s.str.lower()
    for sub in banned_doc_substrings:
        doc_ok &= ~s_low.str.contains(sub.lower(), regex=False).to_numpy()

    i = batch.schema.get_field_index(col)
    return (batch.set_column(i, col, pa.array(joined.tolist(), pa.string()))
            .append_column("c4_lines_removed",
                           pa.array(removed.to_numpy(), pa.int64()))
            .append_column("c4_doc_ok", pa.array(doc_ok, pa.bool_())))


def dedup_lines_within_doc_batch(batch: pa.Table, col: str = "text",
                                 keep_blank: bool = True) -> pa.Table:
    """Within-document repeated-line removal (the Dolma/RefinedWeb in-doc
    dedup rule): every line keeps only its FIRST occurrence inside the doc,
    matched on the trimmed bytes; later repeats are dropped. Blank lines are
    structure, not repetition — kept by default. Stateless per batch (the
    doc is one row), one vectorized explode + duplicated() per batch;
    appends ``lines_deduped`` (count of removed lines)."""
    import pandas as pd

    s = batch.column(col).to_pandas().fillna("")
    idx = s.index
    lines = s.str.split("\n").explode()
    trimmed = lines.str.strip().fillna("")
    dup = pd.DataFrame({"d": lines.index, "t": trimmed}).duplicated()
    dup = pd.Series(dup.to_numpy(), index=lines.index)
    if keep_blank:
        dup &= (trimmed != "").to_numpy()
    kept = lines[~dup.to_numpy()].fillna("")
    joined = (kept.groupby(level=0).agg("\n".join)
              .reindex(idx, fill_value="").fillna(""))
    removed = (pd.Series(dup.to_numpy(), index=lines.index)
               .groupby(level=0).sum().reindex(idx, fill_value=0)
               .astype("int64"))
    i = batch.schema.get_field_index(col)
    return (batch.set_column(i, col, pa.array(joined.tolist(), pa.string()))
            .append_column("lines_deduped",
                           pa.array(removed.to_numpy(), pa.int64())))


def compression_ratio_batch(batch: pa.Table, col: str = "text",
                            level: int = 6) -> pa.Table:
    """zlib compression ratio per document (compressed bytes / raw UTF-8
    bytes; empty text -> 1.0). The standard compressibility quality signal:
    highly repetitive/templated text compresses far below ~0.4, while
    random-looking bytes stay near (or above) 1.0 — curation drops both
    tails. Per-row zlib.compress is a C call on the encoded buffer (the
    Python loop only dispatches), deterministic at a fixed level."""
    import zlib

    texts = batch.column(col).to_pylist()
    ratios = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        raw = (t or "").encode("utf-8")
        if not raw:
            ratios[i] = 1.0
        else:
            ratios[i] = len(zlib.compress(raw, level)) / len(raw)
    return batch.append_column("compression_ratio",
                               pa.array(ratios, pa.float64()))


# ---------------------------------------------------------------------------
# hashed n-gram language model (CCNet-style quality signal)
# ---------------------------------------------------------------------------
# A perplexity-proxy scorer in the CCNet tradition (Wenzek et al. 2020): train
# word uni/bigram counts on a trusted reference corpus, score candidate docs
# by cross-entropy bits/token, drop the worst. Counts live in a HASHED bucket
# space (the fastText / DSIR trick) so the model is a fixed-size dense array
# — broadcastable, mergeable by plain summation, immune to vocabulary blowup.
# Hash collisions conflate rare grams; with the default 2^20 buckets that is
# noise next to the signal (documented, standard for hashed LMs).

#: stupid-backoff discount (Brants et al. 2007)
_LM_BACKOFF = 0.4


def _lm_gram_buckets(texts, n_buckets: int):
    """Per-position hashed gram buckets for a batch of texts: returns
    ``(doc_idx, uni_b, bi_b, lens)`` where ``uni_b[i]`` is the unigram bucket
    of token i (flat, doc-contiguous, position order) and ``bi_b[i]`` the
    ORDER-SENSITIVE bigram bucket of (token i, token i+1) — valid where
    ``i+1`` is in the same doc, else the row is absent from ``bi_b``'s
    positions (``bi_b`` has len-1 entries per doc). Word hashing shares the
    dedup kernel (vhash.hash64 over lowercased whitespace words); the bigram
    fold runs the first word through an extra splitmix64 so "a b" != "b a"
    (the shingle kernel's symmetric xor would conflate reversed contexts —
    fine for set-similarity, wrong for a language model)."""
    from .dedup import _positional_grams
    from .vhash import splitmix64

    doc_idx, _, wh, lens, _ = _positional_grams(texts, 1)
    nb = np.uint64(n_buckets)
    uni_b = (wh % nb).astype(np.int64)
    # mask: position has a same-doc successor
    if len(wh):
        has_next = np.ones(len(wh), dtype=bool)
        ends = np.cumsum(lens)[:-1] if len(lens) > 1 else np.empty(0, np.int64)
        last = np.concatenate([ends, [len(wh)]]).astype(np.int64) - 1
        last = last[last >= 0]
        has_next[last] = False
        idx = np.nonzero(has_next)[0]
        bi = splitmix64(splitmix64(wh[idx]) ^ wh[idx + 1])
        bi_b = (bi % nb).astype(np.int64)
    else:
        bi_b = np.empty(0, dtype=np.int64)
    return doc_idx, uni_b, bi_b, lens


def train_ngram_lm(ds, col: str = "text", n_buckets: int = 1 << 20) -> dict:
    """Train the hashed uni/bigram counts on a reference corpus — ONE
    streaming pass: each batch emits its nonzero (key, cnt) rows (key packs
    kind and bucket into one int64: uni = bucket, bi = n_buckets + bucket,
    total-token sentinel = 2*n_buckets), a single groupby-sum merges them,
    and the driver densifies the <= 2*n_buckets+1 result rows. Counts are
    integers summed in any order, so training is partitioning-invariant.

    Returns {'n_buckets', 'uni', 'bi', 'total'} (dense int64 arrays — ~8 MB
    per array at the default 2^20, broadcast once via ray.put for scoring)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        _, uni_b, bi_b, lens = _lm_gram_buckets(texts, n_buckets)
        keys = np.concatenate([uni_b, bi_b + n_buckets,
                               [2 * n_buckets]]).astype(np.int64)
        cnts = np.concatenate([np.ones(len(uni_b) + len(bi_b), np.int64),
                               [int(lens.sum())]])
        # pre-aggregate within the batch before the shuffle (combiner)
        uk, inv = np.unique(keys, return_inverse=True)
        agg = np.bincount(inv, weights=cnts).astype(np.int64)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "cnt": pa.array(agg, pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    uni = np.zeros(n_buckets, dtype=np.int64)
    bi = np.zeros(n_buckets, dtype=np.int64)
    total = 0
    k = rows["key"].to_numpy()
    c = rows["cnt"].to_numpy()
    um = k < n_buckets
    uni[k[um]] = c[um]
    bm = (k >= n_buckets) & (k < 2 * n_buckets)
    bi[k[bm] - n_buckets] = c[bm]
    tm = k == 2 * n_buckets
    if tm.any():
        total = int(c[tm][0])
    return {"n_buckets": n_buckets, "uni": uni, "bi": bi, "total": total}


def _lm_bits_for_texts(texts, model: dict) -> np.ndarray:
    """Cross-entropy bits/token per doc under the hashed bigram LM with
    stupid backoff: the first token and any unseen-context token score on
    the add-1-smoothed unigram (discounted by _LM_BACKOFF for the backoff
    case); a seen (context, token) bigram scores count(bigram)/count(context).
    Empty docs score NaN. Fully vectorized (one pass of array indexing +
    one bincount per batch)."""
    n_buckets = model["n_buckets"]
    uni, bi, total = model["uni"], model["bi"], model["total"]
    doc_idx, uni_b, bi_b, lens = _lm_gram_buckets(texts, n_buckets)
    n_docs = len(lens)
    out = np.full(n_docs, np.nan)
    if len(uni_b) == 0:
        return out
    denom = float(total + n_buckets)
    p_uni = (uni[uni_b] + 1.0) / denom          # add-1 unigram, per position
    logp = np.empty(len(uni_b), dtype=np.float64)

    # positions with a same-doc predecessor score on the bigram leg
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    is_first = np.zeros(len(uni_b), dtype=bool)
    is_first[starts[lens > 0]] = True
    logp[is_first] = np.log2(p_uni[is_first])

    rest = np.nonzero(~is_first)[0]
    if len(rest):
        # bi_b rows align with "position that HAS a successor", in order —
        # the successor positions are exactly the non-first ones, in order
        c_bi = bi[bi_b]
        prev_pos = rest - 1
        c_prev = uni[uni_b[prev_pos]]
        seen = (c_bi > 0) & (c_prev > 0)
        pr = np.where(seen, c_bi / np.maximum(c_prev, 1),
                      _LM_BACKOFF * p_uni[rest])
        logp[rest] = np.log2(pr)

    sums = np.bincount(doc_idx, weights=-logp, minlength=n_docs)
    nz = lens > 0
    out[nz] = sums[nz] / lens[nz]
    return out


class NgramLMStage:
    """Actor stage: holds the broadcast LM (fetched once per actor), appends
    ``lm_bits`` (cross-entropy bits/token; NaN for empty docs)."""

    def __init__(self, model_ref, col: str = "text"):
        import ray

        self.model = (ray.get(model_ref)
                      if not isinstance(model_ref, dict) else model_ref)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bits = _lm_bits_for_texts(batch.column(self.col).to_pylist(),
                                  self.model)
        return batch.append_column("lm_bits", pa.array(bits, pa.float64()))


def lm_score(ds, model: dict, col: str = "text"):
    """Append ``lm_bits`` to every row (broadcast model, actor pool)."""
    import ray

    mref = ray.put(model)
    return ds.map_batches(NgramLMStage,
                          fn_constructor_kwargs=dict(model_ref=mref, col=col),
                          batch_format="pyarrow", concurrency=_pool())


def vocab_counts(ds, col: str = "text", min_count: int = 1):
    """Exact corpus word counts (lowercased whitespace words): per-batch
    pre-aggregated (word, cnt) partials -> ONE groupby-sum shuffle of
    vocabulary-sized rows (never corpus-sized — the combiner runs before
    the exchange). Returns a Dataset of (word, cnt)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(col).to_pylist(), dtype=object)
        words = s.fillna("").astype(str).str.lower().str.split().explode()
        words = words[words.notna()]
        vc = words.value_counts()
        return pa.table({"word": pa.array(vc.index.astype(object)),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t.column("cnt"),
                                                        min_count)),
            batch_format="pyarrow")
    return out


def build_vocab(ds, size: int, col: str = "text",
                min_count: int = 1) -> pa.Table:
    """The top-``size`` vocabulary by (count DESC, word ASC): exact counts
    from :func:`vocab_counts`, then the global top-k WITHOUT a global sort —
    each batch of the counted table emits its local top-``size`` and the
    driver merges the bounded partials (the listing_top1000 shape). Returns
    a small Arrow table (word, cnt, rank), rank 1-based."""
    import pandas as pd

    counted = vocab_counts(ds, col=col, min_count=min_count)

    def topk(batch: pa.Table) -> pa.Table:
        df = pa.Table.to_pandas(batch)
        df = df.sort_values(["cnt", "word"], ascending=[False, True],
                            kind="mergesort").head(size)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = counted.map_batches(topk, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    df = pd.DataFrame(parts)
    df = (df.sort_values(["cnt", "word"], ascending=[False, True],
                         kind="mergesort").head(size).reset_index(drop=True))
    df["rank"] = np.arange(1, len(df) + 1)
    return pa.Table.from_pandas(df, preserve_index=False)


def lm_perplexity_buckets(ds, model: dict, col: str = "text",
                          quantiles: tuple = (1 / 3, 2 / 3),
                          labels: tuple = ("head", "middle", "tail"),
                          bin_width: float = 0.01):
    """CCNet's perplexity bucketing (Wenzek et al. 2020): score every doc
    with the hashed LM, find the corpus-level quantile edges of ``lm_bits``
    with the mergeable binned-quantile sketch (one combiner pass, occupied-
    bin rows only), and label each doc head/middle/tail (lowest bits =
    ``head`` = most fluent). Edges are bin lower bounds, so the labeling is
    deterministic and batching-independent; NaN bits (empty docs) label as
    the last bucket. The scored table is pinned once (materialize) because
    both the edge pass and the label pass consume it — without the pin the
    LM scoring stage would run twice. Returns the Dataset with ``lm_bits``
    and ``ppl_bucket`` appended."""
    from .sketches import binned_quantiles

    if len(labels) != len(quantiles) + 1:
        raise ValueError("need exactly len(quantiles)+1 labels")
    scored = lm_score(ds, model, col=col).materialize()
    sk = binned_quantiles(scored, "lm_bits", bin_width=bin_width,
                          qs=list(quantiles))
    # an empty corpus / all-NaN bits yields None quantiles: +inf edges keep
    # searchsorted well-typed (there are no finite bits to label anyway)
    edges = np.array([np.inf if sk["quantiles"][q] is None
                      else sk["quantiles"][q] for q in quantiles])
    lab = np.asarray(labels, dtype=object)

    def label(batch: pa.Table) -> pa.Table:
        bits = batch.column("lm_bits").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, bits, side="right")
        idx = np.where(np.isnan(bits), len(lab) - 1, idx)
        return batch.append_column("ppl_bucket",
                                   pa.array(lab[idx.astype(np.int64)]))

    return scored.map_batches(label, batch_format="pyarrow")

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()
