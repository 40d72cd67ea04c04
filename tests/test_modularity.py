"""Newman modularity as an exact rational."""

from __future__ import annotations

from fractions import Fraction

import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import modularity_report


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _labels(d):
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(list(d), pa.string()),
                "community": pa.array([d[k] for k in d], pa.string()),
            }
        )
    )


TWO_TRIANGLES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("x", "y"), ("y", "z"), ("z", "x"),
    ("a", "x"),
]


class TestModularity:
    def test_textbook_two_triangles(self):
        lbl = {"a": "1", "b": "1", "c": "1", "x": "2", "y": "2", "z": "2"}
        out = modularity_report(_edges(TWO_TRIANGLES), _labels(lbl)).iloc[0]
        assert Fraction(int(out["q_num"]), int(out["q_den"])) == Fraction(5, 14)
        assert out["n_edges"] == 7 and out["n_communities"] == 2

    def test_single_community_is_zero(self):
        lbl = {n: "c" for n in "abcxyz"}
        out = modularity_report(_edges(TWO_TRIANGLES), _labels(lbl)).iloc[0]
        # Q = (4m*m - (2m)^2) / 4m^2 = 0
        assert out["q_num"] == 0

    def test_unlabeled_nodes_become_singletons(self):
        out = modularity_report(
            _edges([("p", "q"), ("q", "r")]), _labels({"p": "1"})
        ).iloc[0]
        assert out["n_communities"] == 3

    def test_layout_independence(self):
        lbl = {"a": "1", "b": "1", "c": "1", "x": "2", "y": "2", "z": "2"}
        a = modularity_report(_edges(TWO_TRIANGLES), _labels(lbl))
        b = modularity_report(
            _edges(TWO_TRIANGLES).repartition(4), _labels(lbl)
        )
        assert a.equals(b)
