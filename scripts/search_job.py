"""Search job entrypoint — query an index from the command line or
``ray job submit``.

    python scripts/search_job.py --index-dir /shared/index \
        --query '+merge -spark "window function"~2' -k 10

    # batch mode: one query per line, distributed over an actor pool
    python scripts/search_job.py --index-dir /shared/index \
        --queries-file queries.txt --out /tmp/results --concurrency 8

Single queries run in-process (one IndexSearcher); batch mode runs the
distributed search pipeline (query-chunk x shard actor pool, exact top-k
merge) and writes partitioned Parquet. Syntax flavors: classic (default),
``--syntax simple`` (lenient), ``--syntax surround`` (W/N distance ops).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", help="one query string (in-process search)")
    p.add_argument("--queries-file", help="file of query strings, one per line "
                                          "(distributed batch pipeline)")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--syntax", default="classic",
                   choices=["classic", "simple", "surround"])
    p.add_argument("--algo", default="auto", choices=["auto", "exhaustive", "wand"])
    p.add_argument("--out", help="output dir for batch-mode parquet results")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)
    if bool(args.query) == bool(args.queries_file):
        p.error("exactly one of --query / --queries-file is required")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        if args.query:
            from lucene_ray.query import parse_simple_query
            from lucene_ray.searcher import IndexSearcher
            from lucene_ray.surround import parse_surround_query

            s = IndexSearcher(args.index_dir)
            # all flavors normalize query terms through the INDEX's analyzer
            # chain (a stemmed/folded index must meet stemmed/folded terms)
            norm = s.query_analyzer().normalize
            if args.syntax == "simple":
                q = parse_simple_query(args.query, normalize=norm)
            elif args.syntax == "surround":
                q = parse_surround_query(args.query, normalize=norm)
            else:
                q = s.parse(args.query)
            t0 = time.time()
            td = s.search(q, args.k, algo=args.algo)
            for rank, sd in enumerate(td.score_docs, start=1):
                print(json.dumps({"rank": rank, "doc_key": str(sd.doc_key),
                                  "score": round(sd.score, 6)}))
            print(json.dumps({"total_hits": td.total_hits,
                              "took_ms": round(1000 * (time.time() - t0), 1)}),
                  file=sys.stderr)
        else:
            from lucene_ray.pipelines.search_pipeline import search_distributed

            with open(args.queries_file) as f:
                queries = [ln.strip() for ln in f if ln.strip()]
            t0 = time.time()
            ds = search_distributed(args.index_dir, queries, k=args.k,
                                    algo=args.algo,
                                    concurrency=args.concurrency)
            if args.out:
                ds.write_parquet(args.out)
                n = len(queries)
            else:
                for row in ds.take_all():
                    print(json.dumps({k: (str(v) if k == "doc_key" else v)
                                      for k, v in row.items()}))
                n = len(queries)
            print(json.dumps({"queries": n,
                              "took_ms": round(1000 * (time.time() - t0), 1)}),
                  file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
