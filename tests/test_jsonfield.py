"""Columnar JSON field extraction: fast-path/fallback agreement on
nested, malformed, escaped, and non-integer payloads."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.jsonfield import json_field_int


class TestJsonFieldInt:
    CASES = [
        ('{"k": 69}', 69),                      # flat fast path
        ('{"k":-7, "x": 1}', -7),               # negative, multiple keys
        ('{"x": {"k": 5}}', None),              # nested k is NOT top-level
        ('{"k": {"k": 5}}', None),              # top-level k non-integer
        ('{"k": 6.5}', None),                   # float -> NULL
        ('{"k": true}', None),                  # bool is not an int here
        ('{"k": "69"}', None),                  # string -> NULL
        ('{"note": "\\"k\\": 9", "k": 3}', 3),  # pattern inside a string
        ("not json", None),
        ("", None),
        (None, None),
        ('{"other": 1}', None),                 # missing field
        ('  {"k": 12}  ', 12),                  # surrounding whitespace
    ]

    def test_semantics(self):
        df = pd.DataFrame(
            {
                "row_id": range(len(self.CASES)),
                "props": [c[0] for c in self.CASES],
            }
        )
        out = (
            json_field_int(ray.data.from_pandas(df), "props", "k")
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        want = [c[1] for c in self.CASES]
        got = [None if pd.isna(v) else int(v) for v in out["k"]]
        assert got == want

    def test_fallback_matches_fast_path(self):
        # every flat doc must give the same answer through json.loads
        import json

        flat = [c for c in self.CASES if c[0] and c[0].strip().startswith("{")]
        for s, want in flat:
            try:
                obj = json.loads(s)
                v = obj.get("k")
                slow = (
                    int(v)
                    if isinstance(v, int) and not isinstance(v, bool)
                    else None
                )
            except ValueError:
                slow = None
            assert slow == want, s
