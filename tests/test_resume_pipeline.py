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


def _edges_set(out_dir):
    import duckdb

    return set(
        map(
            tuple,
            duckdb.sql(
                f"select src, predicate, dst from '{out_dir}/edges/*.parquet'"
            ).fetchall(),
        )
    )


@pytest.mark.slow
def test_resume_canonicalization_is_global(tmp_path):
    """Alias variants planted on BOTH sides of the crash boundary:
    'factories' only in first-half partitions, 'factory' only in
    second-half ones. Since canonicalization runs in the global
    finalize (never per increment), the resumed run must elect the
    same canonical forms as the single-shot run."""
    from ai_knowledge_graph_ray.sources.pages import PAGES_SCHEMA, wrap_html

    # The mock extractor pairs token[i] -> token[i+2] over significant
    # tokens, so these texts reliably emit the planted entity.
    text_a = "factories drive production factories power mills factories shape cities"
    text_b = "factory builds engines factory makes goods factory employs workers"
    rows_a, rows_b = [], []
    i = 0
    while len(rows_a) < 6 or len(rows_b) < 6:
        url = f"https://ex.test/p{i}"
        half = partition_of(url, 8) < 4
        if half and len(rows_a) < 6:
            rows_a.append((url, text_a + f" variant{i}"))
        elif not half and len(rows_b) < 6:
            rows_b.append((url, text_b + f" variant{i}"))
        i += 1
    rows = rows_a + rows_b
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
                "html": pa.array([wrap_html(r[1]) for r in rows], pa.binary()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            },
            schema=PAGES_SCHEMA,
        )
    ).materialize()

    # inference off: this test pins STANDARDIZATION semantics across the
    # crash boundary; skipping Phase 3 keeps the three runs fast.
    cfg = {**CFG, "inference": {"enabled": False}}
    single = str(tmp_path / "single")
    run_resumable(pages, single, cfg, num_partitions=8, run_id="s")

    resumed = str(tmp_path / "resumed")
    first_half = pages.filter(lambda r: partition_of(r["url"], 8) < 4)
    run_resumable(first_half, resumed, cfg, num_partitions=8, run_id="r1")
    run_resumable(pages, resumed, cfg, num_partitions=8, run_id="r2")

    single_edges = _edges_set(single)
    assert single_edges == _edges_set(resumed)
    # the stem merge actually fired: only ONE canonical form survives
    ents = {e for s, _, d in single_edges for e in (s, d)}
    assert ("factory" in ents) ^ ("factories" in ents)


def test_empty_input_finalizes_cleanly(tmp_path):
    """An all-empty input (or a finalize with nothing checkpointed)
    must produce zeroed stats, not a read error."""
    from ai_knowledge_graph_ray.sources.pages import PAGES_SCHEMA

    empty = ray.data.from_arrow(PAGES_SCHEMA.empty_table())
    stats = run_resumable(
        empty, str(tmp_path / "empty"), {"runtime": {"lexical_mode": "exact"}},
        num_partitions=4,
    )
    assert stats == {
        "nodes": 0, "edges": 0, "original_edges": 0,
        "inferred_edges": 0, "communities": 0,
    }
