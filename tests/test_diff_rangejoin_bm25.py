"""Snapshot diff, interval (range) join, and integer BM25 retrieval:
SQL-oracle equivalence on randomized inputs plus edge-case probes."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.diff import snapshot_diff
from ai_knowledge_graph_ray.stages.rangejoin import interval_join
from ai_knowledge_graph_ray.stages.retrieval import bm25_more_like_this

KEY_SCHEMA = pa.schema([("k", pa.int64())])


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestSnapshotDiff:
    def _old(self):
        return pd.DataFrame(
            {"k": [1, 2, 3, 4], "v": [10, 20, 30, 40], "s": ["a", "b", "c", "d"]}
        )

    def _new(self):
        # 1 unchanged, 2 changed (v), 3 removed, 5 added
        return pd.DataFrame(
            {"k": [1, 2, 4, 5], "v": [10, 99, 40, 50], "s": ["a", "b", "d", "e"]}
        )

    def test_classification(self):
        out = (
            snapshot_diff(_ds(self._old()), _ds(self._new()), ["k"], ["v", "s"])
            .to_pandas()
            .sort_values("k")
        )
        assert dict(zip(out["k"], out["change"])) == {
            2: "changed",
            3: "removed",
            5: "added",
        }
        # unchanged keys (1, 4) are dropped
        assert set(out["k"]) == {2, 3, 5}

    def test_md5_contract_matches_duckdb(self):
        row = self._old().iloc[0]
        want = duckdb.sql(
            "SELECT md5(concat_ws('|', CAST(10 AS VARCHAR), 'a'))"
        ).fetchone()[0]
        got = hashlib.md5(f"{row['v']}|{row['s']}".encode()).hexdigest()
        assert got == want

    def test_empty_new_side(self):
        empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype=object)})
        out = snapshot_diff(
            _ds(self._old()), _ds(empty, parts=1), ["k"], ["v", "s"],
            key_schema=KEY_SCHEMA,
        ).to_pandas()
        assert set(out["change"]) == {"removed"}
        assert len(out) == 4

    def test_random_vs_sql_full_outer(self):
        rng = np.random.RandomState(7)
        old = pd.DataFrame({
            "k": np.arange(500, dtype="int64"),
            "v": rng.randint(0, 5, 500).astype("int64"),
        })
        new = pd.DataFrame({
            "k": np.arange(100, 620, dtype="int64"),
            "v": rng.randint(0, 5, 520).astype("int64"),
        })
        got = (
            snapshot_diff(_ds(old), _ds(new), ["k"], ["v"])
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("old_t", old)
        con.register("new_t", new)
        want = con.execute("""
            WITH o AS (SELECT k, md5(CAST(v AS VARCHAR)) h FROM old_t),
                 n AS (SELECT k, md5(CAST(v AS VARCHAR)) h FROM new_t)
            SELECT coalesce(o.k, n.k) AS k,
                   CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM o FULL OUTER JOIN n ON o.k = n.k
            WHERE coalesce(o.h, '') <> coalesce(n.h, '')
            ORDER BY k
        """).df()
        assert got["k"].tolist() == want["k"].tolist()
        assert got["change"].tolist() == want["change"].tolist()


class TestIntervalJoin:
    OUT_SCHEMA = pa.schema(
        [("pid", pa.int64()), ("p", pa.int64()),
         ("iid", pa.int64()), ("s", pa.int64()), ("e", pa.int64())]
    )

    def _run(self, points: pd.DataFrame, intervals: pd.DataFrame, width: int):
        return (
            interval_join(
                _ds(points), _ds(intervals),
                point_col="p", start_col="s", end_col="e",
                bucket_width=width, out_schema=self.OUT_SCHEMA,
            )
            .to_pandas()
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )

    def test_basic_containment_half_open(self):
        points = pd.DataFrame({"pid": [1, 2, 3], "p": [5, 10, 15]})
        ivs = pd.DataFrame({"iid": [100], "s": [5], "e": [15]})
        out = self._run(points, ivs, width=4)
        # half-open: p=5 in, p=10 in, p=15 (== end) out
        assert out["pid"].tolist() == [1, 2]

    def test_interval_spanning_many_cells_joins_once(self):
        points = pd.DataFrame({"pid": [1], "p": [50]})
        ivs = pd.DataFrame({"iid": [9], "s": [0], "e": [1000]})
        out = self._run(points, ivs, width=3)  # interval covers ~334 cells
        assert len(out) == 1

    def test_empty_and_negative_intervals_dropped(self):
        points = pd.DataFrame({"pid": [1], "p": [5]})
        ivs = pd.DataFrame({"iid": [1, 2], "s": [5, 9], "e": [5, 2]})
        # all-empty results lose their schema in Ray (NOTES.md item 7),
        # so probe via count, not a sorted frame
        out = interval_join(
            _ds(points), _ds(ivs),
            point_col="p", start_col="s", end_col="e",
            bucket_width=4, out_schema=self.OUT_SCHEMA,
        )
        assert out.count() == 0

    def test_random_vs_sql_range_join(self):
        rng = np.random.RandomState(11)
        points = pd.DataFrame({
            "pid": np.arange(2000, dtype="int64"),
            "p": rng.randint(0, 100_000, 2000).astype("int64"),
        })
        s = rng.randint(0, 100_000, 300).astype("int64")
        ivs = pd.DataFrame({
            "iid": np.arange(300, dtype="int64"),
            "s": s,
            "e": s + rng.randint(1, 5_000, 300).astype("int64"),
        })
        got = self._run(points, ivs, width=1024)
        con = duckdb.connect()
        con.register("pt", points)
        con.register("iv", ivs)
        want = con.execute("""
            SELECT pt.pid, pt.p, iv.iid, iv.s, iv.e
            FROM pt JOIN iv ON pt.p >= iv.s AND pt.p < iv.e
            ORDER BY pid, iid
        """).df()
        assert len(got) == len(want)
        for c in ["pid", "p", "iid", "s", "e"]:
            assert got[c].tolist() == want[c].tolist()


BM25_ORACLE_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS token
  FROM docs_t
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS avgdl_milli
  FROM dl
),
q AS (
  SELECT DISTINCT doc_id AS query_id, token FROM tok
  WHERE doc_id IN ({qids})
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok
  WHERE token IN (SELECT token FROM q) GROUP BY token
),
idf AS (
  SELECT token,
         ((SELECT n_docs FROM stats) - df) * 1000 // df AS idf_milli
  FROM df
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         idf.idf_milli
           * (tf.tf * 2200 * 1000
              // (tf.tf * 1000
                  + (1200 * (1000 - 750
                             + (750 * (dl.dl * 1000000
                                       // (SELECT avgdl_milli FROM stats)))
                               // 1000))
                    // 1000))
           // 1000 AS c
  FROM q
  JOIN tf ON tf.token = q.token
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN idf ON idf.token = q.token
),
scored AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_milli
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_milli,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_milli DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_milli, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


class TestBm25MoreLikeThis:
    def _docs(self, rng: np.random.RandomState, n: int = 200) -> pd.DataFrame:
        vocab = np.array(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "rare1", "rare2"], dtype=object
        )
        p = np.array([0.2, 0.18, 0.15, 0.12, 0.1, 0.08, 0.06, 0.04, 0.03,
                      0.02, 0.01, 0.01])
        texts = [
            " ".join(rng.choice(vocab, size=rng.randint(3, 30), p=p))
            for _ in range(n)
        ]
        texts[5] = ""  # zero-token doc excluded from stats
        return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})

    def test_matches_integer_sql_oracle(self):
        docs = self._docs(np.random.RandomState(3))
        qids = [0, 7, 42]
        got = (
            bm25_more_like_this(_ds(docs, parts=5), qids, k=10)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("docs_t", docs)
        want = con.execute(
            BM25_ORACLE_SQL.format(qids="0, 7, 42", k=10)
        ).df()
        assert len(got) == len(want)
        for c in ["query_id", "doc_id", "score_milli", "rank"]:
            assert got[c].tolist() == want[c].tolist(), c

    def test_query_doc_ranks_itself_first(self):
        docs = pd.DataFrame({
            "doc_id": pd.Series([0, 1, 2], dtype="int64"),
            "text": ["cat dog bird", "cat dog", "fish"],
        })
        out = bm25_more_like_this(_ds(docs, parts=1), [0], k=3).to_pandas()
        top = out[out["rank"] == 1].iloc[0]
        assert top["doc_id"] == 0

    def test_empty_query_set(self):
        docs = pd.DataFrame({"doc_id": pd.Series([0], dtype="int64"),
                             "text": ["hello"]})
        out = bm25_more_like_this(_ds(docs, parts=1), [])
        assert out.count() == 0

    def test_partition_invariance(self):
        docs = self._docs(np.random.RandomState(9), n=80)
        a = (
            bm25_more_like_this(_ds(docs, parts=1), [3], k=5)
            .to_pandas().sort_values("rank").reset_index(drop=True)
        )
        b = (
            bm25_more_like_this(_ds(docs, parts=7), [3], k=5)
            .to_pandas().sort_values("rank").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestScd2History:
    def _snaps(self) -> pd.DataFrame:
        # key 1: stable value across all 3 snaps -> one interval
        # key 2: value change at snap 2 -> two intervals
        # key 3: absent at snap 2 (delete + re-insert of SAME value)
        #        -> gap breaks the run -> two intervals
        # key 4: appears only at snap 3
        return pd.DataFrame(
            {
                "key": [1, 1, 1, 2, 2, 2, 3, 3, 4],
                "snap": [1, 2, 3, 1, 2, 3, 1, 3, 3],
                "val": ["a", "a", "a", "x", "y", "y", "m", "m", "z"],
            }
        )

    def test_intervals(self):
        from ai_knowledge_graph_ray.stages.diff import scd2_history

        out = (
            scd2_history(_ds(self._snaps(), parts=4))
            .to_pandas()
            .sort_values(["key", "valid_from"])
            .reset_index(drop=True)
        )
        got = list(
            zip(out["key"], out["val"], out["valid_from"], out["valid_to"])
        )
        assert got == [
            (1, "a", 1, 3),
            (2, "x", 1, 1),
            (2, "y", 2, 3),
            (3, "m", 1, 1),
            (3, "m", 3, 3),
            (4, "z", 3, 3),
        ]

    def test_sql_twin_randomized(self):
        from ai_knowledge_graph_ray.stages.diff import scd2_history

        rng = np.random.default_rng(7)
        n = 400
        rows = []
        for key in range(40):
            for snap in range(1, 11):
                if rng.random() < 0.25:  # random deletions
                    continue
                rows.append((key, snap, str(rng.integers(0, 3))))
        df = pd.DataFrame(rows, columns=["key", "snap", "val"])
        df["key"] = df["key"].astype("int64")
        df["snap"] = df["snap"].astype("int64")

        got = (
            scd2_history(_ds(df, parts=5))
            .to_pandas()
            .sort_values(["key", "valid_from"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("snaps", df)
        want = con.execute(
            """
            WITH flagged AS (
              SELECT key, snap, val,
                     CASE WHEN lag(val) OVER w IS DISTINCT FROM val
                            OR snap - lag(snap) OVER w > 1
                          THEN 1 ELSE 0 END AS chg
              FROM snaps WINDOW w AS (PARTITION BY key ORDER BY snap)
            ),
            grp AS (
              SELECT key, snap, val,
                     sum(chg) OVER (PARTITION BY key ORDER BY snap) AS g
              FROM flagged
            )
            SELECT key, val, CAST(min(snap) AS BIGINT) AS valid_from,
                   CAST(max(snap) AS BIGINT) AS valid_to
            FROM grp GROUP BY key, val, g
            ORDER BY key, valid_from
            """
        ).df()
        want["key"] = want["key"].astype("int64")
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
