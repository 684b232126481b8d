"""CLI entry point — the unit a cluster runs via ``ray job submit``:

    ray job submit -- python -m finance_sc_relations_ray.cli \\
        --pages /data/pages --out /data/triples --num-parts 4096

Owns its Ray session (guarded init: under ``ray job submit`` the
cluster address env is already set; standalone it starts local mode).
Resumable: re-running with the same ``--out`` skips completed
partitions via the manifest (pipelines/run.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Ray Data KG construction")
    p.add_argument("--pages", required=True, help="pages parquet file/dir")
    p.add_argument("--out", required=True, help="output dir (partitioned triples)")
    p.add_argument("--num-parts", type=int, default=64)
    p.add_argument("--parts-per-chunk", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU count (ignored on a cluster)")
    p.add_argument("--merge", action="store_true",
                   help="also write the globally-deduplicated merge")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local" if args.num_cpus else None,
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import scaled_config
    from .pipelines.run import merge_parts, run_partitioned

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    summary = run_partitioned(
        args.pages,
        args.out,
        num_parts=args.num_parts,
        parts_per_chunk=args.parts_per_chunk,
        config=scaled_config(ncpu),
    )
    if args.merge:
        merged = merge_parts(args.out)
        merged.write_parquet(args.out + "_merged")
        summary["merged_rows"] = merged.count()
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
