"""Index compaction job entrypoint for ``ray job submit``.

Merges every appended segment generation back into one and (by default)
physically vacuums tombstoned docs, refreshing corpus statistics over the
surviving corpus — the offline "next rebuild" the reference's delete
semantics defer to (reference analog: DELETE /api/contents,
smse_backend/routes/content.py). Post-compaction search results are
bitwise-equal to a full rebuild of the surviving corpus
(tests/test_compact.py).

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/compact_job.py --index-dir s3://bucket/index/v1

Locally (auto-inits a local Ray session):

    python scripts/compact_job.py --index-dir /tmp/idx

Prints one JSON line of compaction metrics.
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
    ap.add_argument("--index-dir", required=True, help="index root (local path or any pyarrow.fs URI)")
    ap.add_argument(
        "--no-vacuum",
        action="store_true",
        help="merge generations only; tombstoned docs stay in the index and "
        "tombstones keep filtering them at query time",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from smse_backend_ray.pipelines.build import compact_index

    t0 = time.time()
    cat = compact_index(args.index_dir, vacuum=not args.no_vacuum)
    stats = cat.get_stats()
    stages = cat.manifest().get("stages", {})
    out = {
        "index_dir": str(args.index_dir),
        "compact_sec": round(time.time() - t0, 3),
        "n_docs": stats.get("n_docs"),
        "avgdl": stats.get("avgdl"),
        "vacuumed": stages.get("compact", {}).get("metrics", {}).get("vacuumed", 0),
        "generations": sorted(int(g) for g in cat.generations()),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
