"""Index-build job entrypoint — the unit you'd hand to ``ray job submit``.

    ray job submit --working-dir /root/repo -- \
        python scripts/index_job.py --source /data/pages/*.parquet \
        --index-dir /shared/index --partitions 256 --extract-html --resume

Resumable: completed partitions (durable segment dirs) are skipped; the
manifest commit at the end is atomic, so a crashed run leaves either the old
generation or the new one, never a torn state.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="parquet path/glob or sf dir")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--key-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--analyzer", default="standard",
                   choices=["standard", "simple", "english", "whitespace"])
    p.add_argument("--extract-html", action="store_true")
    p.add_argument("--dedup", action="store_true", help="exact dedup by key first")
    p.add_argument("--no-positions", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--merge", action="store_true", help="run a tiered merge round after")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.state.merge import merge_index

    t0 = time.time()
    manifest = build_index(
        args.source,
        args.index_dir,
        key_col=args.key_col,
        text_col=args.text_col,
        num_partitions=args.partitions,
        analyzer=args.analyzer,
        store_positions=not args.no_positions,
        resume=not args.no_resume,
        extract_html=args.extract_html,
        dedup_exact=args.dedup,
    )
    if args.merge:
        manifest = merge_index(args.index_dir)
    cs = manifest.collection_stats()
    print(json.dumps({
        "gen": manifest.gen,
        "segments": len(manifest.segments),
        "max_doc": cs.max_doc,
        "sum_total_term_freq": cs.sum_total_term_freq,
        "wall_sec": round(time.time() - t0, 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
