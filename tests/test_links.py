"""href extraction and inbound-link counting over raw html, plus the
round-trip invariant with links present."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.html_extract import (
    extract_links,
    extract_text,
    wrap_html,
)
from ai_knowledge_graph_ray.stages.webtext import link_counts


class TestExtractLinks:
    def test_order_and_targets(self):
        html = wrap_html("para one\n\npara two", links=("u1", "u2", "u1"))
        assert extract_links(html) == ["u1", "u2", "u1"]

    def test_roundtrip_unchanged_by_links(self):
        text = "alpha beta\n\ngamma"
        assert extract_text(wrap_html(text, links=("x", "y"))) == text
        assert extract_text(wrap_html(text)) == text

    def test_no_links(self):
        assert extract_links(wrap_html("t")) == []
        assert extract_links(b"") == []


class TestLinkCounts:
    def test_counts(self):
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "html": pa.array(
                        [
                            wrap_html("a", links=("t1", "t2")),
                            wrap_html("b", links=("t2",)),
                            wrap_html("c"),
                        ],
                        pa.binary(),
                    )
                }
            )
        ).repartition(3)
        out = link_counts(pages).to_pandas()
        got = dict(zip(out["dst_url"], out["n_inlinks"]))
        assert got == {"t1": 1, "t2": 2}

    def test_duplicate_anchors_counted(self):
        pages = ray.data.from_arrow(
            pa.table(
                {"html": pa.array([wrap_html("a", links=("t", "t", "t"))], pa.binary())}
            )
        )
        out = link_counts(pages).to_pandas()
        assert out.iloc[0]["n_inlinks"] == 3


class TestLinkEdges:
    def test_multiplicity_and_src(self):
        from ai_knowledge_graph_ray.stages.webtext import link_edges

        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["u1", "u2"], pa.string()),
                    "html": pa.array(
                        [
                            wrap_html("a", links=("t", "t", "x")),
                            wrap_html("b", links=("y",)),
                        ],
                        pa.binary(),
                    ),
                }
            )
        ).repartition(2)
        out = link_edges(pages).to_pandas()
        pairs = sorted(zip(out["src"], out["dst"]))
        assert pairs == [("u1", "t"), ("u1", "t"), ("u1", "x"), ("u2", "y")]

    def test_pagerank_composite_matches_local_twin(self):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            pagerank_int,
            pagerank_int_local,
        )
        from ai_knowledge_graph_ray.stages.webtext import link_edges

        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["a", "b", "c"], pa.string()),
                    "html": pa.array(
                        [
                            wrap_html("1", links=("b", "c")),
                            wrap_html("2", links=("c",)),
                            wrap_html("3"),
                        ],
                        pa.binary(),
                    ),
                }
            )
        ).repartition(2)
        edges = link_edges(pages)
        got = (
            pagerank_int(edges, iters=3)
            .to_pandas()
            .set_index("node")["rank_scaled"]
            .to_dict()
        )
        want = pagerank_int_local(
            [("a", "b"), ("a", "c"), ("b", "c")], iters=3
        )
        assert got == want
