"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module;
nothing here (or in the library) initializes or shuts down Ray.

- ``entry()`` — flagship KG-construction pipeline on sf0.001 pages.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operators); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible
  subset (identical column names/types; integer-cent money to avoid
  float-summation hash drift). As of round 4 this includes the full
  flagship chain (raw extraction -> standardization -> inference ->
  edges, via exact twins of the deterministic mock model) and the
  HLL estimates; the remaining rows-only queries are structurally
  non-SQL (media codecs, seeded-RNG prose, siphash MinHash, float
  embeddings, BPE loops) and are pinned by pytest instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: full KG build (extract -> chunk -> mock-model triples
    -> canonicalize -> infer -> materialize) over sf0.001; returns the
    edges table."""
    from ai_knowledge_graph_ray.pipelines.kg import build_graph
    from ai_knowledge_graph_ray.sources.pages import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    res = build_graph(
        pages,
        {
            "chunking": {"chunk_size": 200, "overlap": 40},
            "runtime": {"lexical_mode": "blocked"},
        },
    )
    return res["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    from ai_knowledge_graph_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ai_knowledge_graph_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
