"""Relational operators from SURVEY.md section 2 re-expressed Ray-Data-first,
exercised against the driver's parquet tables (TESTDATA.md) so each has a
DuckDB-checkable oracle in __ray_entry__.oracle_sql().

Mapping (see each function's docstring for the reference site):
filters M7/M8/M11/M12, grouped top-k O1, grouped argmax G5, broadcast hash
join J3, duplicate-key detection D3, as-of join J4, case-when classification
G6, global aggregates G1/G2, partial-then-final aggregation (the combiner
pattern the 100 TB shuffle budget requires).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    """Column-pruned parquet read (prune at the read — never load columns a
    2-column transform doesn't need)."""
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --- aggregation with partial combine (G1 + section 2.8 metrics) ------------

def lineitem_metrics_agg(sf_dir: str):
    """Pricing-summary aggregate over lineitem: per (returnflag, linestatus)
    sums/avgs/count. Pre-aggregated inside map_batches (one partial row per
    key per batch), then a tiny groupby — the combiner pattern that keeps the
    all-to-all exchange proportional to keys, not rows."""
    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                   "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch.column("l_shipdate"),
                                       pa.scalar(pd.Timestamp("1998-09-02"))))
        df = t.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        gr = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"))
        return pa.Table.from_pandas(gr, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # rounded to fixed decimals so the partial-sum association order can
        # never flip a bit against the sequential-sum oracle
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "l_linestatus": [g["l_linestatus"].iloc[0]],
            "sum_qty": [round(g["sum_qty"].sum(), 2)],
            "sum_base_price": [round(g["sum_base_price"].sum(), 2)],
            "sum_disc_price": [round(g["sum_disc_price"].sum(), 2)],
            "avg_qty": [round(g["sum_qty"].sum() / g["count_order"].sum(), 6)],
            "count_order": [int(g["count_order"].sum())],
        })

    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        combine, batch_format="pandas")


# --- filters (M7 empty-diff / M8 distance slice / M11 substring / M12 state) -

def filter_value_threshold(sf_dir: str):
    """M7 analog: vectorized predicate inside map_batches (events.value >
    100)."""
    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])
    return ds.map_batches(lambda t: t.filter(pc.greater(t.column("value"), 100.0)),
                          batch_format="pyarrow")


def filter_rounded_equality(sf_dir: str):
    """M8 analog (the distance-slice filter): round-then-equality on a float
    key — the reference's rd-rounded identity keys (brdrq_settings DECIMAL=1)."""
    ds = read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_discount"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.round(t.column("l_discount"), 2), 0.05)),
        batch_format="pyarrow")


#: fixed query of the filter_substring composite's bm25 leg — three
#: mid-frequency fixture terms so tf, dl-normalization and idf all vary
BM25_QUERY = "window merge sort"


def filter_substring(sf_dir: str):
    """M11 composite (one driver row gates both forms): leg 'doc_text' is the
    single-column substring filter; leg 'part_multi' is the FULL reference
    form — keyword-prioritized multi-field search with the id always included
    and the field list capped (reference: _feature_matches_filter +
    _update_search_field_selection,
    plugin/brdrq/brdrq_dockwidget_featurealigner.py:479-529). The cap is
    load-bearing in the fixture: keywords ('name','type') + max_fields=3
    select [p_name, p_type, p_partkey], so 'Brand#13' rows match only if the
    needle hits a SELECTED field — an uncapped search would return more.

    Leg 'bm25' (r5) is distributed BM25 full-text search
    (functions/search.py::bm25_search) over the same documents table for the
    fixed query BM25_QUERY, all positive-score docs (no top-k cutoff — rank
    boundaries under float ties are pytest-gated; the driver gate checks the
    full scoring path value-for-value against a DuckDB reproduction of the
    Lucene-idf Okapi formula)."""
    docs = read(sf_dir, "documents", ["doc_id", "lang", "text"])
    doc_leg = docs.map_batches(
        lambda t: (lambda f: pa.table({
            "leg": pa.array(["doc_text"] * f.num_rows),
            "id": pc.cast(f.column("doc_id"), pa.string()),
            "extra": f.column("lang"),
            "score": pa.nulls(f.num_rows, pa.float64()),
        }))(t.filter(pc.match_substring(pc.utf8_lower(t.column("text")), "window"))),
        batch_format="pyarrow")

    parts = read(sf_dir, "part",
                 ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])
    hits = feature_search(parts, "13", id_col="p_partkey",
                          keywords=("name", "type"), max_fields=3)
    part_leg = hits.map_batches(
        lambda f: pa.table({
            "leg": pa.array(["part_multi"] * f.num_rows),
            "id": pc.cast(f.column("p_partkey"), pa.string()),
            "extra": f.column("p_brand"),
            "score": pa.nulls(f.num_rows, pa.float64()),
        }), batch_format="pyarrow")

    from .search import bm25_search
    bm = bm25_search(read(sf_dir, "documents", ["doc_id", "text"]),
                     {"q0": BM25_QUERY}, k=1_000_000)
    bm_leg = pa.table({
        "leg": pa.array(["bm25"] * len(bm), pa.string()),
        "id": pa.array(bm["doc_id"].astype(str), pa.string()),
        "extra": pa.array(bm["query_id"], pa.string()),
        # keep bm25_search's round-9 grid as-is: re-rounding a 1e-9-gridded
        # value to 6 decimals lands on half-boundaries ~1/1000 of the time,
        # where engine/oracle rounding modes can legitimately split
        "score": pa.array(bm["score"], pa.float64()),
    })
    import ray.data
    return doc_leg.union(part_leg).union(ray.data.from_arrow(bm_leg))


def search_field_selection(names, keywords=(), max_fields: int = 15) -> list:
    """M11 field prioritization (reference: _update_search_field_selection,
    plugin/brdrq/brdrq_dockwidget_featurealigner.py:497-529): fields whose
    NAME contains any keyword come first (schema order), then the remaining
    fields (schema order), truncated to ``max_fields`` (reference default 15,
    brdrq_settings search_max_fields)."""
    kws = [str(k).strip().lower() for k in keywords if str(k).strip()]
    matched = [n for n in names if kws and any(k in n.lower() for k in kws)]
    remaining = [n for n in names if n not in matched]
    selected = matched + remaining
    return selected[:max_fields] if max_fields and max_fields > 0 else selected


def feature_search(ds: ray.data.Dataset, needle: str, id_col: str,
                   keywords=(), max_fields: int = 15) -> ray.data.Dataset:
    """M11 full form: case-insensitive substring match of ``needle`` against
    the id column PLUS up to ``max_fields`` keyword-prioritized attribute
    columns (reference: _feature_matches_filter,
    plugin/brdrq/brdrq_dockwidget_featurealigner.py:479-495 — the id is
    always searched, attributes are stringified, any hit keeps the row).

    Vectorized: per selected column one utf8_lower + match_substring C++
    kernel per batch, OR-folded; non-string columns are cast to string once
    (Arrow cast semantics — ints render like str(int); documented deviation
    for floats, whose repr may differ from Python's)."""
    needle = str(needle).lower()
    cols = list(dict.fromkeys(
        [id_col, *search_field_selection(ds.schema().names, keywords, max_fields)]))

    def _search(t: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            if c not in t.column_names:
                continue
            col = t.column(c)
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                col = pc.cast(col, pa.string())
            m = pc.fill_null(pc.match_substring(pc.utf8_lower(col), needle), False)
            mask = m if mask is None else pc.or_(mask, m)
        return t.filter(mask)

    return ds.map_batches(_search, batch_format="pyarrow")


def filter_state(sf_dir: str):
    """M12 analog: equality filter on a state/enum column."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    return ds.map_batches(lambda t: t.filter(pc.equal(t.column("event_type"), "click")),
                          batch_format="pyarrow")


# --- grouped top-k (O1) and argmax (G5) -------------------------------------

def grouped_topk_orders(sf_dir: str, k: int = 3, n_buckets: int = 64):
    """O1: per-customer top-k orders by (totalprice desc, orderkey asc) — a
    grouped top-k, never a global sort. Shuffled by a hash bucket of the
    customer key; the per-customer head(k) is one vectorized pandas groupby
    per bucket (n_buckets Python calls, not n_customers)."""
    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("o_custkey").cast(pa.int64())
             .to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
        return t.append_column("b", pa.array(b, pa.int32()))

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        g = g.groupby("o_custkey", group_keys=False).head(k).copy()
        g["rk"] = g.groupby("o_custkey").cumcount() + 1
        return g.drop(columns=["b"])

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(topk_bucket, batch_format="pandas"))


def grouped_argmax_orders(sf_dir: str):
    """G5: best (argmax) row per group — the reference's best-prediction
    selection (plugin/brdrq/brdrq_dockwidget_featurealigner.py:1362-1369)."""
    return grouped_topk_orders(sf_dir, k=1).drop_columns(["rk"])


# --- joins ------------------------------------------------------------------

def broadcast_hash_join(sf_dir: str):
    """J3: orders ⋈ customer on custkey with the SMALL side broadcast
    (ray.put of ONE Arrow table once, zero-copy reads per actor) — no
    shuffle. The probe is two C++ kernels per batch (`pc.index_in` into the
    build keys + `take` of the payload columns), never a per-row Python
    dict lookup. Duplicate-build-key semantics: index_in keeps the FIRST
    occurrence — a deliberate r4 change from the r3 dict build (which kept
    the LAST); build sides are expected key-unique (the reference keys its
    dict by unique feature id, plugin/brdrq/brdrq_utils.py:1236-1291
    analog), so dedupe a non-unique build side explicitly before joining."""
    cust = pa.concat_tables([
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        for t in ray.get(read(sf_dir, "customer",
                              ["c_custkey", "c_name", "c_mktsegment"])
                         .to_arrow_refs())]).combine_chunks()
    lookup_ref = ray.put(cust)

    class Probe:
        def __init__(self):
            t = ray.get(lookup_ref)
            self.keys = t.column("c_custkey").combine_chunks()
            self.name = t.column("c_name").combine_chunks()
            self.seg = t.column("c_mktsegment").combine_chunks()

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch.column("o_custkey").cast(self.keys.type),
                              value_set=self.keys)
            mask = pc.is_valid(idx)
            out = batch.filter(mask)
            hit = idx.filter(mask)
            return (out.append_column("c_name", self.name.take(hit))
                       .append_column("c_mktsegment", self.seg.take(hit)))

    ds = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4))


def partitioned_hash_join(sf_dir: str, n_buckets: int = 64):
    """J3 at scale (both sides large): tagged-union + groupby(HASH BUCKET of
    the key) + one vectorized pandas merge per bucket — the explicit
    partitioned hash join. Bucketing (not the raw key) keeps the Python
    per-group overhead at n_buckets, not n_keys."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])

    def o_side(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").cast(pa.int64())
        b = (k.to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
        return pa.table({"b": pa.array(b, pa.int32()), "k": k,
                         "o_orderkey": t.column("o_orderkey"),
                         "o_totalprice": t.column("o_totalprice"),
                         "c_name": pa.nulls(t.num_rows, pa.string())})

    def c_side(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").cast(pa.int64())
        b = (k.to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
        return pa.table({"b": pa.array(b, pa.int32()), "k": k,
                         "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                         "o_totalprice": pa.nulls(t.num_rows, pa.float64()),
                         "c_name": t.column("c_name")})

    tagged = (orders.map_batches(o_side, batch_format="pyarrow")
              .union(cust.map_batches(c_side, batch_format="pyarrow")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        build = g.loc[g["c_name"].notna(), ["k", "c_name"]]
        probe = g.loc[g["o_orderkey"].notna(),
                      ["k", "o_orderkey", "o_totalprice"]]
        if build.empty or probe.empty:
            return pd.DataFrame({"o_orderkey": [], "o_custkey": [],
                                 "o_totalprice": [], "c_name": []})
        m = probe.merge(build, on="k", how="inner")
        return pd.DataFrame({"o_orderkey": m["o_orderkey"].astype("int64"),
                             "o_custkey": m["k"].astype("int64"),
                             "o_totalprice": m["o_totalprice"],
                             "c_name": m["c_name"]})

    return tagged.groupby("b").map_groups(join_bucket, batch_format="pandas")


def native_hash_join(sf_dir: str):
    """J3 via Ray Data's built-in hash-partitioned ``Dataset.join`` (available
    in this Ray version) — the platform-native alternative to the explicit
    tagged-union join; same oracle as the broadcast variant."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = orders.join(cust, join_type="inner", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))
    return joined.select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_name"])


def semi_join(data: ray.data.Dataset, keys: ray.data.Dataset, on: str,
              anti: bool = False, n_buckets: int = 64) -> ray.data.Dataset:
    """Distributed semi-join (J4 building block): keep data rows whose ``on``
    value appears in ``keys`` (``anti=True`` inverts: keep rows with NO match).
    Tagged-union + groupby on a HASH BUCKET of the key (one vectorized isin
    per bucket — not one Python call per key) — one shuffle, no driver-side
    key set, so the key side can be arbitrarily large (the autoupdate
    changed-since detection at reference-table scale)."""
    from .vhash import bucket_i32

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:  # pandas-backed blocks report numpy dtypes / python classes
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    sch = data.schema()
    if sch is None:
        # a fully-filtered upstream yields zero blocks and no schema; the
        # semi/anti join of an empty corpus is the empty corpus
        return data
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        schema = base
    elif isinstance(sch, pa.Schema):
        schema = sch
    else:  # ray Schema wrapper without an Arrow base: rebuild from names/types
        schema = pa.schema([(n, _arrow_type(t))
                            for n, t in zip(sch.names, sch.types)])

    key_type = schema.field(on).type

    def bucket_of(t: pa.Table) -> pa.Array:
        # cast both union sides to the data schema's key type so they hash
        # identically (vectorized — no per-row Python)
        return bucket_i32(t.column(on).cast(key_type), n_buckets)

    def data_side(t: pa.Table) -> pa.Table:
        return (t.append_column("__mark", pa.array(np.zeros(t.num_rows, np.int8)))
                 .append_column("__b", bucket_of(t)))

    def key_side(t: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name == on:
                cols[on] = t.column(on).cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        out = pa.table(cols)
        return (out.append_column("__mark", pa.array(np.ones(t.num_rows, np.int8)))
                   .append_column("__b", bucket_of(out)))

    out_schema = pa.schema(list(schema))

    def grp(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        marks = g.column("__mark").to_numpy(zero_copy_only=False)
        present = g.filter(pa.array(marks == 1)).column(on)
        rows = g.filter(pa.array(marks == 0))
        if rows.num_rows == 0:
            return out_schema.empty_table()
        hit = pc.is_in(rows.column(on), value_set=present.combine_chunks().unique())
        hit = pc.fill_null(hit, False)
        keep = pc.invert(hit) if anti else hit
        return rows.filter(keep).drop_columns(["__mark", "__b"])

    tagged = (data.map_batches(data_side, batch_format="pyarrow")
              .union(keys.select_columns([on])
                     .map_batches(key_side, batch_format="pyarrow")))
    return tagged.groupby("__b").map_groups(grp, batch_format="pyarrow")


def lookup_join(data: ray.data.Dataset, lookup: ray.data.Dataset, on: str,
                value_col: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Distributed left LOOKUP join: attach ``value_col`` from ``lookup`` to
    every ``data`` row (null where no match; if a key repeats in ``lookup``
    the first occurrence in bucket order wins). Same tagged-union bucketed
    machinery as :func:`semi_join` — one shuffle, schema-generic, no
    driver-side key set, and no reliance on the platform hash join (whose
    fixed hash partitioner over-partitions small inputs)."""
    from .vhash import bucket_i32

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    def _schema_of(d) -> pa.Schema:
        sch = d.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        if isinstance(sch, pa.Schema):
            return sch
        return pa.schema([(n, _arrow_type(t))
                          for n, t in zip(sch.names, sch.types)])

    if data.schema() is None:
        # empty data side (fully-filtered upstream): nothing to attach to
        return data
    data_schema = _schema_of(data)
    if lookup.schema() is None:
        # empty lookup side: every row gets a null value; the value type is
        # unknowable from zero blocks — string is the generic fallback
        val_type = pa.string()
    else:
        val_type = _schema_of(lookup).field(value_col).type
    key_type = data_schema.field(on).type
    out_schema = pa.schema(list(data_schema) + [pa.field(value_col, val_type)])

    def bucket_of(t: pa.Table) -> pa.Array:
        return bucket_i32(t.column(on).cast(key_type), n_buckets)

    def data_side(t: pa.Table) -> pa.Table:
        return (t.append_column(value_col, pa.nulls(t.num_rows, val_type))
                 .append_column("__mark", pa.array(np.zeros(t.num_rows, np.int8)))
                 .append_column("__b", bucket_of(t)))

    def lookup_side(t: pa.Table) -> pa.Table:
        cols = {}
        for f in data_schema:
            if f.name == on:
                cols[on] = t.column(on).cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        cols[value_col] = t.column(value_col).cast(val_type)
        out = pa.table(cols)
        return (out.append_column("__mark", pa.array(np.ones(t.num_rows, np.int8)))
                   .append_column("__b", bucket_of(out)))

    def grp(g: pa.Table) -> pa.Table:
        marks = g.column("__mark").to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(marks == 0))
        if rows.num_rows == 0:
            return out_schema.empty_table()
        lut = g.filter(pa.array(marks == 1))
        if lut.num_rows == 0:
            return rows.drop_columns(["__mark", "__b"])
        idx = pc.index_in(rows.column(on),
                          value_set=lut.column(on).combine_chunks())
        vals = lut.column(value_col).combine_chunks().take(idx)
        i = rows.schema.get_field_index(value_col)
        return rows.set_column(i, value_col, vals).drop_columns(["__mark", "__b"])

    tagged = (data.map_batches(data_side, batch_format="pyarrow")
              .union(lookup.select_columns([on, value_col])
                     .map_batches(lookup_side, batch_format="pyarrow")))
    return tagged.groupby("__b").map_groups(grp, batch_format="pyarrow")


def semi_join_customers(sf_dir: str):
    """Customers with at least one order above 300k — the distributed
    semi-join exercised against the driver tables (oracle: IN-subquery)."""
    cust = read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    big = read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 300_000.0))
                   .rename_columns(["c_custkey", "o_totalprice"]),
        batch_format="pyarrow")
    return semi_join(cust, big, on="c_custkey")


def anti_join_customers(sf_dir: str):
    """Customers with NO order above 400k (anti-join variant of the same)."""
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    big = read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 400_000.0))
                   .select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow")
    return semi_join(cust, big, on="c_custkey", anti=True)


def hash_join_strategies(sf_dir: str):
    """J3 driver gate for ALL THREE join forms in one row: run the broadcast,
    explicit-partitioned, and native ``Dataset.join`` variants of
    orders x customer over the same input, assert they agree row-for-row on
    the common columns, and return the broadcast result. A disagreement
    raises, so one green CORRECTNESS row gates all three implementations.
    (Correctness probe — runs at the driver's sf0.01 scale; production
    pipelines call the individual forms directly.)"""
    import pandas as pd

    bro = broadcast_hash_join(sf_dir).to_pandas()
    par = partitioned_hash_join(sf_dir).to_pandas()
    nat = native_hash_join(sf_dir).to_pandas()
    common = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return (df[common].sort_values(common, kind="mergesort")
                .reset_index(drop=True))

    a = canon(bro)
    for name, other in (("partitioned", par), ("native", nat)):
        if not a.equals(canon(other)):
            raise AssertionError(f"hash join strategies disagree: "
                                 f"broadcast vs {name}")
    return bro


def semi_anti_join_customers(sf_dir: str):
    """J-semi/anti driver gate in one row: the semi-join (orders > 300k) and
    anti-join (no order > 400k) over customer, labeled and unioned (oracle:
    UNION ALL of the IN / NOT IN subqueries)."""
    def label(side: str):
        def add(t: pa.Table) -> pa.Table:
            return t.select(["c_custkey", "c_name"]).append_column(
                "side", pa.array([side] * len(t), pa.string()))
        return add

    s = semi_join_customers(sf_dir).map_batches(label("semi"),
                                                batch_format="pyarrow")
    a = anti_join_customers(sf_dir).map_batches(label("anti"),
                                                batch_format="pyarrow")
    return s.union(a)


def duplicate_key_detection(sf_dir: str):
    """D3: keys with more than one row (the reference's multi-prediction ->
    TO_REVIEW trigger, plugin/brdrq/brdrq_utils.py:1251-1254)."""
    ds = read(sf_dir, "orders", ["o_custkey"])
    counts = ds.groupby("o_custkey").count()
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1))
                   .rename_columns(["o_custkey", "n_orders"]),
        batch_format="pyarrow")


def asof_join_events(sf_dir: str, n_buckets: int = 64):
    """J4: for each click, the latest strictly-earlier view of the same user
    (as-of backward join). Shuffled by a hash bucket of the user; inside a
    bucket ONE pd.merge_asof(by='user_id') handles every user vectorized —
    the reference's changed-since/version join analog."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").cast(pa.int64())
             .to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
        return t.append_column("b", pa.array(b, pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        clicks = (g[g["event_type"] == "click"][["event_id", "user_id", "ts"]]
                  .sort_values("ts"))
        views = (g[g["event_type"] == "view"][["user_id", "ts"]]
                 .rename(columns={"ts": "prev_view_ts"})
                 .sort_values("prev_view_ts"))
        if clicks.empty:
            return pd.DataFrame({"event_id": [], "user_id": [], "ts": [],
                                 "prev_view_ts": []})
        if views.empty:
            clicks["prev_view_ts"] = pd.NaT
            return clicks
        return pd.merge_asof(clicks, views, left_on="ts",
                             right_on="prev_view_ts", by="user_id",
                             allow_exact_matches=False)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(per_bucket, batch_format="pandas"))


# --- classification (G6) and global aggregates (G1/G2) ----------------------

def case_when_classification(sf_dir: str):
    """G6: vectorized case-when banding + grouped count (the correction-state
    thresholds, plugin/brdrq/brdrq_utils.py:1288-1291).

    COMPOSITE since r5: the row also carries per-band p50/p90 bins from the
    grouped mergeable quantile sketch (sketches.grouped_binned_quantiles —
    per-(group, bin) count partials, ONE histogram-row groupby; same
    floor/ceil formula the global sketch exposes in global_minmax's SQL,
    here reproduced PARTITIONED BY band)."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def band(t: pa.Table) -> pa.Table:
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        lab = np.where(p < 50_000, "small", np.where(p < 150_000, "mid", "large"))
        return pa.table({"band": pa.array(lab, pa.string()),
                         "o_totalprice": t.column("o_totalprice")})

    from .sketches import grouped_binned_quantiles

    banded = ds.map_batches(band, batch_format="pyarrow").materialize()
    counts = (banded.groupby("band").count()
              .map_batches(lambda t: t.rename_columns(["band", "n"]),
                           batch_format="pyarrow").to_pandas())
    qs = grouped_binned_quantiles(banded, "band", "o_totalprice",
                                  bin_width=1000.0,
                                  qs=(0.5, 0.9)).to_pandas()
    out = counts.merge(
        qs.rename(columns={"p0.5": "p50_bin", "p0.9": "p90_bin"})[
            ["band", "p50_bin", "p90_bin"]], on="band")
    return out.sort_values("band").reset_index(drop=True)


def global_minmax(sf_dir: str):
    """G2 analog + global stats composite: min/max aggregate (the
    combined-bbox pattern) plus DETERMINISTIC binned quantiles of `value`
    (mergeable histogram sketch, functions/sketches.binned_quantiles —
    bin-resolution answers the SQL oracle reproduces with the same
    floor/ceil formula, so the sketch family is driver-hash-gated)."""
    from ..functions.sketches import quantiles_from_hist
    ds = read(sf_dir, "events", ["value", "user_id"])
    w = 0.5

    def partial(t: pa.Table) -> pa.Table:
        # ONE scan: each batch emits min/max partials AND its histogram
        # (bins/counts as list columns on a single row) — the driver merges
        # n_batches tiny rows, never a second pass over the table
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        vf = v[np.isfinite(v)]
        bins, cnts = np.unique(np.floor(vf / w).astype(np.int64),
                               return_counts=True)
        return pa.table({
            "bins": pa.array([bins.tolist()], pa.list_(pa.int64())),
            "counts": pa.array([cnts.tolist()], pa.list_(pa.int64())),
            "vmin": pa.array([float(v.min()) if len(v) else np.inf]),
            "vmax": pa.array([float(v.max()) if len(v) else -np.inf]),
            "umin": pa.array([int(u.min()) if len(u) else 2**62], pa.int64()),
            "umax": pa.array([int(u.max()) if len(u) else -2**62], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    import pandas as pd
    allbins = np.concatenate([np.asarray(b, np.int64) for b in parts["bins"]])
    allcnts = np.concatenate([np.asarray(c, np.int64) for c in parts["counts"]])
    merged = pd.Series(allcnts).groupby(allbins).sum().sort_index()
    qr = quantiles_from_hist(merged.index.to_numpy(), merged.to_numpy(),
                             w, (0.5, 0.9, 0.99))
    # composite leg (r5): the distributed dataset profiler's fused-scan fold
    # (functions/profile.py::profile_dataset — the distributed `describe`)
    # cross-checked in the same driver row. DuckDB reproduces rows / nulls /
    # mean / string-length stats exactly (HLL distinct is gated separately
    # by hll_distinct).
    from .profile import profile_dataset
    prof = profile_dataset(read(sf_dir, "events",
                                ["value", "event_type"])).to_pandas()
    prof = prof.set_index("column")
    pv, pt = prof.loc["value"], prof.loc["event_type"]
    return pa.table({
        "min_value": pa.array([float(parts["vmin"].min())], pa.float64()),
        "max_value": pa.array([float(parts["vmax"].max())], pa.float64()),
        "min_user": pa.array([int(parts["umin"].min())], pa.int64()),
        "max_user": pa.array([int(parts["umax"].max())], pa.int64()),
        "p50_value_bin": pa.array([qr["quantiles"][0.5]], pa.float64()),
        "p90_value_bin": pa.array([qr["quantiles"][0.9]], pa.float64()),
        "p99_value_bin": pa.array([qr["quantiles"][0.99]], pa.float64()),
        "prof_value_rows": pa.array([int(pv["rows"])], pa.int64()),
        "prof_value_nulls": pa.array([int(pv["nulls"])], pa.int64()),
        "prof_value_min": pa.array([float(pv["min"])], pa.float64()),
        "prof_value_max": pa.array([float(pv["max"])], pa.float64()),
        "prof_value_mean": pa.array([round(float(pv["mean"]), 6)],
                                    pa.float64()),
        "prof_type_len_mean": pa.array([round(float(pt["len_mean"]), 6)],
                                       pa.float64()),
    })


def global_revenue(sf_dir: str):
    """G1 analog: one global sum via per-batch partials (the union-area
    admission guard computed as a distributed aggregate)."""
    ds = read(sf_dir, "lineitem", ["l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), t.column("l_discount")))).as_py()
        return pa.table({"rev": pa.array([rev or 0.0], pa.float64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # thousands granularity so float summation order can never flip the value
    return pa.table({"total_revenue_k": pa.array([int(round(parts["rev"].sum() / 1000.0))], pa.int64()),
                     "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})
