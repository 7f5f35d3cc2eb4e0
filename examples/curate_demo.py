"""End-to-end curation demo over the driver's small test tables.

Runs the composed training-data curation stack (C4 cleaning, within-doc line
dedup, Gopher rules, compression gate, quality/lang filters, exact + near
dedup, packing) on /root/testdata/sf0.001/documents.parquet and writes the
packed survivors as JSONL + parquet under /tmp/curate_demo.

    python examples/curate_demo.py [sf_dir]

Owns its Ray session (scripts may init; library code never does).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import ray
import ray.data


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from brdrq_ray.pipelines.curation import CurationConfig, curate_and_pack
    from brdrq_ray.sources.jsonl import write_jsonl

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    cfg = CurationConfig(
        quality_min=0.2,
        dedup_lines=True,
        # the tiny fixture docs are short and stopword-free: relax the two
        # Gopher knobs that assume web-scale English prose
        gopher=True,
        gopher_kwargs={"min_words": 5, "min_stop_hits": 0,
                       "min_alpha_word_frac": 0.5},
        compression_min=0.1, compression_max=1.2,
        jaccard_threshold=0.6,
    )
    curated, packed = curate_and_pack(docs, cfg, token_budget=512)
    curated = curated.materialize()
    n_in = docs.count()
    n_out = curated.count()
    print(f"curated {n_in} -> {n_out} docs "
          f"({100.0 * n_out / max(n_in, 1):.1f}% kept)")
    write_jsonl(curated.select_columns(
        ["doc_id", "text", "quality_score", "lang_pred"]),
        "/tmp/curate_demo/curated_jsonl")
    packed.write_parquet("/tmp/curate_demo/packed")
    print("wrote /tmp/curate_demo/curated_jsonl + /tmp/curate_demo/packed")
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
