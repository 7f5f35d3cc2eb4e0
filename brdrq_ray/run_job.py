"""CLI entry point: ``python -m brdrq_ray.run_job job.json`` — the engine's
``ray job submit`` target (the reference's chainable processing-provider run,
SURVEY.md section 2.10). Owns the Ray session (scripts do; library code never
does)."""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m brdrq_ray.run_job <job.json>", file=sys.stderr)
        return 2
    import ray

    from .config import AlignJob, run_job

    with open(argv[0]) as f:
        job = AlignJob.from_json(f.read())
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        stats = run_job(job)
        print(json.dumps(stats, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
