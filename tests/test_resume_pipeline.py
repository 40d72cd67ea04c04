"""Pipeline-level kill-and-resume (FIXTURES.md F8 / SURVEY.md §5.2
item 5): interrupt after k partitions, rerun, assert no duplicate work
and output identical to an uninterrupted run."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ai_knowledge_graph_ray.pipelines.run import run_resumable
from ai_knowledge_graph_ray.sources.pages import pages_from_documents
from ai_knowledge_graph_ray.state.checkpoint import PartitionedSink, partition_of

CFG = {
    "chunking": {"chunk_size": 100, "overlap": 20},
    "runtime": {"lexical_mode": "exact"},
}


def _spo_set(out_dir):
    import duckdb

    return set(
        map(
            tuple,
            duckdb.sql(
                f"select subject, predicate, object from '{out_dir}/triples/part=*/data.parquet'"
            ).fetchall(),
        )
    )


@pytest.mark.slow
def test_kill_and_resume_matches_single_shot(tmp_path):
    pages = pages_from_documents("/root/testdata/sf0.001").limit(60).materialize()

    # Uninterrupted run.
    single = str(tmp_path / "single")
    stats_single = run_resumable(pages, single, CFG, num_partitions=8, run_id="s")

    # Interrupted run: first pass sees only partitions {0..3} of the
    # input (simulating a crash after half the partitions committed).
    resumed = str(tmp_path / "resumed")
    first_half = pages.filter(lambda r: partition_of(r["url"], 8) < 4)
    run_resumable(first_half, resumed, CFG, num_partitions=8, run_id="r1")
    sink = PartitionedSink(f"{resumed}/triples", num_partitions=8, key_col="url")
    done_after_crash = set(sink.done_partitions())
    assert 0 < len(done_after_crash) < 8

    # Resume with the FULL input.
    stats_resumed = run_resumable(pages, resumed, CFG, num_partitions=8, run_id="r2")

    # No duplicate work: partitions completed in run r1 still carry r1.
    entries = sink.done_partitions()
    r1_parts = {p for p, e in entries.items() if e["run_id"] == "r1"}
    assert r1_parts == done_after_crash

    # Identical final output.
    assert _spo_set(single) == _spo_set(resumed)
    assert stats_single == stats_resumed
