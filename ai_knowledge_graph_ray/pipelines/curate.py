"""Corpus-curation job entrypoint (the ``ray job submit`` surface for
the training-data side, mirroring ``run.py`` for the KG side).

Runs :func:`~.curation.curate_corpus` over a documents table and
writes the curated manifest as Parquet partitioned by ``shard_id``
(one directory per training shard — a trainer consumes shards
independently; a partial directory from a crashed run is simply
overwritten on re-run because the output dir is re-created atomically).

    python -m ai_knowledge_graph_ray.pipelines.curate \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated \
        --shard-budget 20000 --default-milli 1000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import ray
import ray.data


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-budget", type=int, default=20_000)
    ap.add_argument("--default-milli", type=int, default=1000)
    ap.add_argument("--rates-json", default=None,
                    help="JSON dict source -> milli rate (e.g. '{\"web\": 500}')")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from .curation import curate_corpus

    from ..sources.readers import read_parquet_clean
    docs = read_parquet_clean(
        os.path.join(args.sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    rates = json.loads(args.rates_json) if args.rates_json else {}
    manifest, report = curate_corpus(
        docs,
        rates_milli=rates,
        default_milli=args.default_milli,
        shard_budget=args.shard_budget,
        with_report=True,
    )
    tmp = args.out + ".building"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    manifest.write_parquet(tmp, partition_cols=["shard_id"])
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    os.replace(tmp, args.out)
    print(json.dumps({"out": args.out, **report}))
    ray.shutdown()


if __name__ == "__main__":
    main()
