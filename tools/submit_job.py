"""Submit a phrasekit_ray pipeline as a Ray job.

The packaging story for a real cluster (the north rule's `ray job
submit` path): ship THIS repo as the job's ``working_dir`` runtime env
and run a CLI subcommand as the entrypoint — every subcommand honors
``RAY_ADDRESS`` (phrasekit_ray/cli.py:33), which the job runner sets.

    python tools/submit_job.py --sf-dir /data/sf0.1 --out /data/out \
        [--address http://head:8265] [--dry-run]

``--dry-run`` prints the submission spec (entrypoint + runtime_env)
without needing the Jobs SDK — this sandbox image ships ray[data]
without ray[default], so actual submission is only possible on a
cluster image; the spec itself is exercised by tests/test_job_submit.py
either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_spec(pages_parquet: str, out_dir: str) -> dict:
    """The submission spec: entrypoint command + runtime env."""
    return {
        "entrypoint": (
            "python -m phrasekit_ray.cli kg "
            f"--pages {pages_parquet} --output {out_dir}"
        ),
        "runtime_env": {
            # ship the repo itself; no pip deps beyond the cluster image
            # (ray[data], pyarrow, numpy, pandas are baked into it)
            "working_dir": REPO_ROOT,
            "excludes": [".git", "tests", "docs", "*.json"],
            "env_vars": {"PYTHONPATH": "."},
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="/tmp/phrasekit_pages.parquet")
    ap.add_argument("--out", default="/tmp/phrasekit_job_out")
    ap.add_argument("--address", default=os.environ.get("RAY_JOBS_ADDRESS"))
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    spec = build_spec(args.pages, args.out)
    if args.dry_run:
        print(json.dumps(spec))
        return 0
    try:
        from ray.job_submission import JobSubmissionClient

        client = JobSubmissionClient(args.address or "http://127.0.0.1:8265")
        job_id = client.submit_job(
            entrypoint=spec["entrypoint"], runtime_env=spec["runtime_env"]
        )
    except Exception as e:  # SDK missing (needs ray[default]) / no head
        print(
            json.dumps(
                {
                    "error": "job submission unavailable; spec printed "
                    "for manual `ray job submit`",
                    "detail": str(e),
                    "spec": spec,
                }
            )
        )
        return 2
    print(json.dumps({"job_id": job_id}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
