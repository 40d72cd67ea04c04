"""Per-stage execution introspection for a registered query: run it
once and print Ray Data's stage-by-stage stats (wall time, rows,
block sizes) — the "measure, don't guess" loop for new operators.

Usage: python tools/explain.py <query_name> [sf_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ai_knowledge_graph_ray.pipelines.queries import QUERIES

    if name not in QUERIES:
        print(f"unknown query {name!r}; {len(QUERIES)} registered")
        raise SystemExit(2)

    t0 = time.time()
    res = QUERIES[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        n = res.count()
        print(f"== {name}: {n} rows in {time.time() - t0:.2f}s ==\n")
        print(res.stats())
    else:
        n = res.num_rows if hasattr(res, "num_rows") else len(res)
        print(
            f"== {name}: {n} rows in {time.time() - t0:.2f}s — "
            "driver-side result (the pipeline stats were consumed inside "
            "the query; wrap intermediate Datasets to inspect stages) =="
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
