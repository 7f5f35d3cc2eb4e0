"""Deterministic synthetic fixtures (FIXTURES.md F1-F4).

The reference test corpus (plugin/brdrq/test/themelayer_test.geojson,
referencelayer_test.geojson, themelayer_metadata.geojson — see SURVEY.md
section 5) cannot be regenerated here (no GEOS, no QGIS), so the engine ships
its own seeded generators with the same *structure*:

* reference = a space-filling tessellation of jittered grid parcels that share
  edges exactly (like adjacent cadastral parcels), with carved "street" gaps
  (open domain) and a dense sub-window (hot-cell skew);
* thematic = unions of 1-3 adjacent parcels with vertex jitter, so that
  alignment at relevant_distance >= jitter recovers the reference shape;
* metadata = SOSA-style ``brdr_metadata`` JSON whose ``derived_from`` entries
  point at reference ids, some with stale version dates (A8 fixture);
* documents = the interleaved text+media span table from BASELINE.json's
  input_hint (doc_id, spans list<struct<kind,text,media_ref,offset>>).

Everything is a pure function of the seed: byte-stable across runs.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import core as g
from ..geom.boolean import dissolve

BASE_DATE = np.datetime64("2020-01-01")


def _node_grid(nx: int, ny: int, seed: int):
    """Jittered grid nodes; column widths vary to create a dense (hot) region.
    Returns nodes array (nx+1, ny+1, 2)."""
    rng = np.random.default_rng(seed)
    # first quarter of the columns is 5x denser -> density skew for hot cells
    widths = np.where(np.arange(nx) < nx // 4, 8.0, 40.0)
    heights = np.where(np.arange(ny) < ny // 4, 8.0, 40.0)
    xs = np.concatenate([[0.0], np.cumsum(widths)])
    ys = np.concatenate([[0.0], np.cumsum(heights)])
    nodes = np.empty((nx + 1, ny + 1, 2))
    nodes[:, :, 0] = xs[:, None]
    nodes[:, :, 1] = ys[None, :]
    # jitter interior nodes by < min_cell/5 so quads stay simple
    jit = rng.uniform(-1.5, 1.5, size=(nx + 1, ny + 1, 2))
    jit[0, :, 0] = jit[-1, :, 0] = 0
    jit[:, 0, 1] = jit[:, -1, 1] = 0
    nodes = nodes + jit
    # offset into the world window so tiles are not at the origin corner
    nodes += np.array([100000.0, 150000.0])
    return g.snap(nodes)


def make_reference_parts(nx: int = 20, ny: int = 20, seed: int = 42):
    """Tessellation parcels as {ref_id: parts}; ~7% of parcels carved out as
    street gaps (open domain), plus version dates."""
    rng = np.random.default_rng(seed + 1)
    nodes = _node_grid(nx, ny, seed)
    parcels = {}
    versions = {}
    for i in range(nx):
        for j in range(ny):
            if rng.random() < 0.07:  # street gap -> open domain
                continue
            ring = np.array([nodes[i, j], nodes[i + 1, j], nodes[i + 1, j + 1], nodes[i, j + 1]])
            if g.ring_signed_area(ring) < 0:
                ring = ring[::-1].copy()
            ref_id = f"P{i:03d}{j:03d}"
            parcels[ref_id] = [[ring]]
            versions[ref_id] = BASE_DATE + rng.integers(0, 1500)
    return parcels, versions


def make_reference_table(nx: int = 20, ny: int = 20, seed: int = 42) -> pa.Table:
    parcels, versions = make_reference_parts(nx, ny, seed)
    ids, wkts, vds, areas, perims = [], [], [], [], []
    for ref_id, parts in parcels.items():
        ids.append(ref_id)
        wkts.append(g.to_wkt(g.GEOM_POLYGON, parts))
        vds.append(versions[ref_id])
        areas.append(g.geom_area(g.GEOM_POLYGON, parts))
        perims.append(g.geom_perimeter(g.GEOM_POLYGON, parts))
    return pa.table({
        "ref_id": pa.array(ids, pa.string()),
        "geometry_wkt": pa.array(wkts, pa.string()),
        "version_date": pa.array(np.array(vds, dtype="datetime64[D]").astype("datetime64[s]")),
        "area_m2": pa.array(areas, pa.float64()),
        "perimeter_m": pa.array(perims, pa.float64()),
    })


def make_thematic_table(nx: int = 20, ny: int = 20, seed: int = 42,
                        n_features: int = 60, jitter: float = 1.0) -> pa.Table:
    """Thematic features: unions of 1-3 adjacent parcels, vertices jittered by
    U(-jitter, +jitter). ~10% get a brdrq_original_wkt snapshot."""
    parcels, _ = make_reference_parts(nx, ny, seed)
    rng = np.random.default_rng(seed + 2)
    keys = sorted(parcels)
    ids, wkts, orig, props = [], [], [], []
    for k in range(n_features):
        # pick a seed parcel and optionally its right/top neighbor(s)
        base = keys[int(rng.integers(0, len(keys)))]
        i, j = int(base[1:4]), int(base[4:7])
        group = [base]
        for di, dj in ((1, 0), (0, 1)):
            if rng.random() < 0.4:
                nb = f"P{i + di:03d}{j + dj:03d}"
                if nb in parcels:
                    group.append(nb)
        merged = dissolve([parcels[m] for m in group])
        # jitter vertices (same snap grid)
        jparts = []
        for rings in merged:
            jrings = []
            for r in rings:
                jr = g.snap(r + rng.uniform(-jitter, jitter, size=r.shape))
                jrings.append(jr)
            jparts.append(jrings)
        _, jparts = g.make_valid(g.GEOM_POLYGON, jparts)
        ids.append(f"T{k:04d}")
        wkts.append(g.to_wkt(g.GEOM_POLYGON, jparts))
        orig.append(wkts[-1] if rng.random() < 0.1 else None)
        props.append(json.dumps({
            "dossier": f"D{k:05d}",
            "survey_date": str(BASE_DATE + int(rng.integers(0, 1000))),
            "category": ["parcel", "building", "monument"][k % 3],
        }, sort_keys=True))
    return pa.table({
        "theme_id": pa.array(ids, pa.string()),
        "geometry_wkt": pa.array(wkts, pa.string()),
        "brdrq_original_wkt": pa.array(orig, pa.string()),
        "props": pa.array(props, pa.string()),
    })


def make_metadata_table(nx: int = 20, ny: int = 20, seed: int = 42,
                        n_features: int = 30) -> pa.Table:
    """F3: thematic rows with SOSA-style brdr_metadata. derived_from ids point
    at reference parcels; version_date older than the parcel's current
    version_date marks the feature as affected by a reference update
    (reference: plugin/brdrq/test/themelayer_metadata.geojson shape;
    consumed by the A8 temporal-update pipeline)."""
    thematic = make_thematic_table(nx, ny, seed, n_features)
    parcels, versions = make_reference_parts(nx, ny, seed)
    rng = np.random.default_rng(seed + 3)
    keys = sorted(parcels)
    metas = []
    for k in range(n_features):
        n_ref = int(rng.integers(1, 4))
        refs = []
        for r in range(n_ref):
            rid = keys[int(rng.integers(0, len(keys)))]
            cur = versions[rid]
            stale = rng.random() < 0.35
            vd = cur - int(rng.integers(30, 400)) if stale else cur
            refs.append({
                "id": f"rg-{k}-{r}",
                "type": "ReferenceGeometry",
                "version_date": str(np.datetime64(vd, "D")),
                "derived_from": {"id": rid, "type": "Parcel", "source": "synthetic-grb"},
            })
        metas.append(json.dumps({
            "actuation": {"id": f"act-{k}", "type": "Actuation", "reference_geometries": refs}
        }, sort_keys=True))
    return thematic.select(["theme_id", "geometry_wkt"]).append_column(
        "brdr_metadata", pa.array(metas, pa.string()))


def make_documents_table(n_docs: int = 200, nx: int = 20, ny: int = 20,
                         seed: int = 42) -> pa.Table:
    """F4: interleaved text + media + geometry spans (BASELINE.json
    input_hint). Geometry spans carry thematic WKT in `text`; offsets give
    intra-document order. Deterministic per seed."""
    thematic = make_thematic_table(nx, ny, seed, n_features=max(60, n_docs // 3))
    geo_wkts = thematic.column("geometry_wkt").to_pylist()
    rng = np.random.default_rng(seed + 4)
    doc_ids, spans_col = [], []
    words = ["parcel", "survey", "border", "road", "deed", "cadastre", "act", "map"]
    for d in range(n_docs):
        n_spans = int(rng.integers(3, 11))
        spans = []
        offset = 0
        for s in range(n_spans):
            kind = ["text", "media", "geometry"][int(rng.choice([0, 0, 0, 1, 2, 2]))]
            if kind == "text":
                txt = " ".join(rng.choice(words, size=int(rng.integers(3, 9))).tolist())
                spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": offset})
                offset += len(txt)
            elif kind == "media":
                ref = f"media://img/{d}/{s}.jpg"
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})
                offset += 1
            else:
                wkt = geo_wkts[int(rng.integers(0, len(geo_wkts)))]
                spans.append({"kind": "geometry", "text": wkt, "media_ref": "", "offset": offset})
                offset += len(wkt)
        doc_ids.append(f"doc-{d:06d}")
        spans_col.append(spans)
    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())])
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans_col, pa.list_(span_type)),
    })
