"""Window operators over the ordered events log.

The reference is strictly batch (SURVEY.md section 2.9 — no streaming
operators), but the engine's 100 TB training-data remit includes
stream-shaped tables. Ray Data has no event-time windows, so windows are
expressed per the engine's standard shape: partition by key, order by ts
INSIDE the group, compute the window with vectorized pandas
(ray_guide 'Streaming-shaped workloads'). The ordering assumption — rows of
one key fit one group and are sorted there — is the documented contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _user_bucket(t: pa.Table, n_buckets: int = 64) -> pa.Table:
    b = (t.column("user_id").cast(pa.int64())
         .to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
    return t.append_column("b", pa.array(b, pa.int32()))


def tumbling_window_agg(sf_dir: str, window_minutes: int = 60) -> ray.data.Dataset:
    """Per (user_id, tumbling window): event count + value sum. Shuffled by a
    hash bucket of the user (one Python call per bucket, not per user); the
    window fold is one vectorized pandas groupby per bucket."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    w_us = np.int64(window_minutes) * 60 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        # force microsecond resolution: pandas may hold ns or us depending on
        # version — epoch arithmetic must not depend on it
        epoch = g["ts"].astype("datetime64[us]").astype("int64")
        win = (epoch // w_us) * w_us
        # emit microsecond-resolution timestamps (matches the parquet/DuckDB
        # timestamp[us] type; pandas' default ns would drift the schema)
        out = (g.assign(window_start=pd.to_datetime(win, unit="us")
                        .astype("datetime64[us]"))
               .groupby(["user_id", "window_start"], as_index=False)
               .agg(n_events=("value", "size"), sum_value=("value", "sum")))
        out["n_events"] = out["n_events"].astype("int64")
        # fixed decimals so float summation order can't flip a bit vs oracle
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (ds.map_batches(_user_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: per_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))


def hopping_window_agg(sf_dir: str, window_minutes: int = 60,
                       hop_minutes: int = 15) -> ray.data.Dataset:
    """Hopping (sliding) windows: each event lands in window_minutes/hop
    overlapping windows. Vectorized explode inside map_batches (one output
    row per (event, covering window) partial) then the tumbling combiner —
    no per-row Python, one groupby shuffle of pre-aggregated partials."""
    assert window_minutes % hop_minutes == 0
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    w_us = np.int64(window_minutes) * 60 * 1_000_000
    h_us = np.int64(hop_minutes) * 60 * 1_000_000
    k = int(window_minutes // hop_minutes)

    def explode_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        epoch = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        base = (epoch // h_us) * h_us          # last hop boundary <= ts
        offs = (np.arange(k, dtype=np.int64) * h_us)[None, :]
        starts = (base[:, None] - offs).ravel()           # k windows per event
        users = np.repeat(df["user_id"].to_numpy(), k)
        vals = np.repeat(df["value"].to_numpy(), k)
        # partial per (user, window) within the batch — the combiner pattern
        part = (pd.DataFrame({"user_id": users, "window_start": starts,
                              "value": vals})
                .groupby(["user_id", "window_start"], as_index=False)
                .agg(n_events=("value", "size"), sum_value=("value", "sum")))
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = ds.map_batches(explode_partial, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = t.column("window_start").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = (np.abs(u * np.int64(1_000_003) + w) % 64).astype(np.int32)
        return t.append_column("b", pa.array(b, pa.int32()))

    def combine_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["user_id", "window_start"], as_index=False)
               .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum")))
        out["window_start"] = (pd.to_datetime(out["window_start"], unit="us")
                               .astype("datetime64[us]"))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (partials.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: combine_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))


def range_join_events(sf_dir: str, band_minutes: int = 30) -> ray.data.Dataset:
    """Banded range join (the brief's 'range join' custom operator): for every
    click, ALL views of the same user within the preceding ``band_minutes``
    (not just the latest — that is the as-of join). One shuffle on a hash
    bucket of the user; the searchsorted interval match runs per user inside
    the bucket (in-process loop, no Ray per-group overhead)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "event_type", "ts"])
    band_us = np.int64(band_minutes) * 60 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("ts")
        views = g[g["event_type"] == "view"].sort_values("ts")
        if clicks.empty or views.empty:
            return pd.DataFrame({"click_id": [], "user_id": [], "view_id": [],
                                 "gap_sec": []})
        ce = clicks["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ve = views["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vid = views["event_id"].to_numpy()
        lo = np.searchsorted(ve, ce - band_us, side="left")
        hi = np.searchsorted(ve, ce, side="left")  # strictly earlier views
        counts = hi - lo
        keep = counts > 0
        reps = counts[keep]
        click_id = np.repeat(clicks["event_id"].to_numpy()[keep], reps)
        click_e = np.repeat(ce[keep], reps)
        view_pos = np.concatenate([np.arange(a, b) for a, b in
                                   zip(lo[keep], hi[keep])]) if keep.any() else \
            np.array([], dtype=np.int64)
        return pd.DataFrame({
            "click_id": click_id.astype("int64"),
            "user_id": g["user_id"].iloc[0],
            "view_id": vid[view_pos].astype("int64"),
            "gap_sec": ((click_e - ve[view_pos]) / 1_000_000.0).round(6),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_user(u) for _, u in g.groupby("user_id", sort=False)]
        if not outs:
            return pd.DataFrame({"click_id": [], "user_id": [], "view_id": [],
                                 "gap_sec": []})
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(_user_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: per_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))


def sliding_session_gap(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows: per user, events closer than `gap` belong to one
    session; emits (user_id, session_start, n_events, duration_sec)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        users = g["user_id"].to_numpy()
        epoch = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = ((np.diff(epoch) > gap_us)
                               | (users[1:] != users[:-1]))
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"user_id": users, "sid": sid, "epoch": epoch})
        agg = (df.groupby(["user_id", "sid"], as_index=False)
               .agg(start=("epoch", "min"), end=("epoch", "max"),
                    n_events=("epoch", "size")))
        return pd.DataFrame({
            "user_id": agg["user_id"],
            "session_start": pd.to_datetime(agg["start"], unit="us").astype("datetime64[us]"),
            "n_events": agg["n_events"].astype("int64"),
            "duration_sec": ((agg["end"] - agg["start"]) / 1_000_000).astype("float64"),
        })

    return (ds.map_batches(_user_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: per_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))
