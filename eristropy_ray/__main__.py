"""Job entry point — the ``ray job submit`` surface.

    ray job submit -- python -m eristropy_ray \
        --input '/data/transcripts/*.parquet' \
        --out /data/rollups --layout conv_files --shards 64

On the sandbox's local mode the same command runs standalone (Ray Data
auto-initialises; an explicit init is guarded). The job is resumable:
re-submitting with the same --out skips shards recorded complete in
MANIFEST.json, and per-(stage, shard) lineage metrics append to
metrics.jsonl.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="eristropy_ray")
    parser.add_argument("--input", required=True, help="transcript parquet glob")
    parser.add_argument("--out", required=True, help="output/checkpoint dir")
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument(
        "--layout", choices=("conv_files", "unpartitioned"), default="conv_files"
    )
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--tiers", default="1m,1h,1d")
    parser.add_argument(
        "--lateness-us", type=int, default=None,
        help="allowed lateness for the (conversation, day)-local "
             "watermark; turns older than (conv-day max ts - lateness) "
             "are dropped before windowing (default: accept all)",
    )
    parser.add_argument("--num-cpus", type=int, default=None,
                        help="only used when this process must init Ray itself")
    args = parser.parse_args(argv)

    from eristropy_ray.config import TIER_STEPS_US

    bad = [t for t in args.tiers.split(",") if t not in TIER_STEPS_US]
    if bad:
        print(
            f"unknown tier(s) {bad}; valid: {sorted(TIER_STEPS_US)}",
            file=sys.stderr,
        )
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    from eristropy_ray.raylog import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()
    DataContext.get_current().enable_progress_bars = False

    from eristropy_ray.config import RollupConfig
    from eristropy_ray.pipelines.rollup import run_rollup_job

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2
    cfg = RollupConfig(
        tiers=tuple(args.tiers.split(",")), lateness_us=args.lateness_us
    )
    summary = run_rollup_job(
        files,
        args.out,
        cfg=cfg,
        n_shards=args.shards,
        resume=not args.no_resume,
        layout=args.layout,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
