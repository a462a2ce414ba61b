"""Corpus-curation job entrypoint for ``ray job submit``.

Runs the end-to-end pretraining curation chain (exact dedup -> quality
floor -> lang allowlist -> Bernoulli sample -> deterministic shuffle rank
-> sequence-pack offsets; pipelines/curate.py, frozen semantics in
config.CURATE_*) over a ``documents`` table and writes the survivors as
shard-partitioned parquet — one directory per ordered key range, the
resume unit whose rank/offset bases are deterministic.

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/curate_job.py --sf-dir s3://bucket/corpus \
            --output s3://bucket/curated/v1

Locally (auto-inits a local Ray session):

    python scripts/curate_job.py --sf-dir /root/testdata/sf0.001 \
        --output /tmp/curated

Prints one JSON line: per-shard row counts + totals. Without --output the
result is collected and summarized only (gate/debug mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir", required=True,
        help="directory holding documents.parquet (local path or URI)",
    )
    ap.add_argument(
        "--output", default=None,
        help="write survivors as shard-partitioned parquet here; omit to "
        "collect and summarize only",
    )
    ap.add_argument(
        "--n-ranges", type=int, default=None,
        help="key-range count override (output is range-invariant)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from smse_backend_ray.pipelines.curate import curation_pipeline

    t0 = time.time()
    if args.output:
        manifest = curation_pipeline(
            args.sf_dir, n_ranges=args.n_ranges, out_dir=args.output
        )
        out = {
            "sf_dir": args.sf_dir,
            "output": args.output,
            "curate_sec": round(time.time() - t0, 3),
            "n_shards": manifest.num_rows,
            "n_rows": int(sum(manifest["n_rows"].to_pylist())),
            "shards": dict(
                zip(manifest["shard"].to_pylist(), manifest["n_rows"].to_pylist())
            ),
        }
    else:
        t = curation_pipeline(args.sf_dir, n_ranges=args.n_ranges)
        out = {
            "sf_dir": args.sf_dir,
            "curate_sec": round(time.time() - t0, 3),
            "n_rows": t.num_rows,
            "total_tokens": int(sum(t["n_tokens"].to_pylist())),
            "n_bins": len(set(t["bin"].to_pylist())),
        }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
