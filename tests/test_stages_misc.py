"""Tests for training-data generation, graph ops, checkpoint/resume,
multimodal plumbing (SURVEY.md S5/S10/K6/K7/G9/G10/M14-M16/J4)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.graph_ops import (
    coverage_report,
    extract_concepts,
    node_degrees,
    recursive_split,
    relation_type_counts,
    tag_signal_noise,
)
from ai_knowledge_graph_ray.stages.multimodal import (
    MediaFeatureExtractor,
    extract_media_features,
    frame_sample_stub,
    synth_media_from_documents,
)
from ai_knowledge_graph_ray.stages.training import (
    format_examples,
    generate_neighborhood_qa,
    generate_relationship_qa,
    merge_training_data,
    train_test_split,
)
from ai_knowledge_graph_ray.state.checkpoint import PartitionedSink, partition_of


def _edges_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "src": ["steam_engine", "steam_engine", "railway", "coal", "mill", "coal"],
                "dst": ["factory", "mill", "market", "steam_engine", "cloth", "power"],
                "predicate": ["powers", "powers", "connects", "fuels", "produces", "fuels"],
                "inferred": [False] * 6,
            }
        )
    )


class TestTraining:
    def test_relationship_qa_deterministic(self):
        a = generate_relationship_qa(_edges_ds(), seed=42).take_all()
        b = generate_relationship_qa(_edges_ds(), seed=42).take_all()
        key = lambda rows: sorted(r["instruction"] for r in rows)
        assert key(a) == key(b)
        assert len(a) == 6
        assert all("relationship" in r["category"] for r in a)

    def test_relationship_qa_cap(self):
        n = 100
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": [f"e{i}" for i in range(n)],
                    "dst": [f"f{i}" for i in range(n)],
                    "predicate": ["links"] * n,
                    "inferred": [False] * n,
                }
            )
        )
        rows = generate_relationship_qa(ds, seed=42, max_per_rel=30).take_all()
        assert len(rows) == 30

    def test_noise_predicates_skipped(self):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": ["a1", "b1"],
                    "dst": ["c1", "d1"],
                    "predicate": ["##", "ok_rel"],
                    "inferred": [False, False],
                }
            )
        )
        rows = generate_relationship_qa(ds).take_all()
        assert len(rows) == 1

    def test_neighborhood_qa(self):
        rows = generate_neighborhood_qa(_edges_ds()).take_all()
        by_subject = {r["instruction"]: r for r in rows}
        assert any("Steam Engine" in k for k in by_subject)

    def test_formats(self):
        qa = generate_relationship_qa(_edges_ds())
        for fmt, field in [("chatml", "messages"), ("alpaca", "instruction"), ("sharegpt", "conversations")]:
            recs = format_examples(qa, fmt=fmt).take_all()
            parsed = json.loads(recs[0]["record"])
            assert field in parsed

    def test_merge_dedup(self):
        a = generate_relationship_qa(_edges_ds())
        b = generate_relationship_qa(_edges_ds())  # identical -> full dedup
        merged = merge_training_data([a, b])
        assert merged.count() == 6

    def test_split(self):
        qa = generate_relationship_qa(_edges_ds())
        train, test = train_test_split(qa, test_ratio=0.5, seed=7)
        assert train.count() + test.count() == 6


class TestGraphOps:
    def test_relation_counts(self):
        rows = {
            r["predicate"]: r["n_edges"]
            for r in relation_type_counts(_edges_ds()).take_all()
        }
        assert rows == {"powers": 2, "connects": 1, "fuels": 2, "produces": 1}

    def test_node_degrees(self):
        deg = {r["entity"]: r["degree"] for r in node_degrees(_edges_ds()).take_all()}
        assert deg["steam_engine"] == 3
        assert deg["coal"] == 2

    def test_tag_signal_noise(self):
        triples = ray.data.from_arrow(
            pa.table(
                {
                    "subject": ["steam engine", "random thing"],
                    "predicate": ["powers", "does"],
                    "object": ["factory", "stuff"],
                }
            )
        )
        tagged, stats = tag_signal_noise(triples, ["steam", "factory"])
        assert stats == {"total": 2, "signal": 1, "noise": 1}

    def test_extract_concepts(self):
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "The steam engine transformed factory work.",
                        "Nothing relevant here.",
                    ],
                }
            )
        )
        hits = extract_concepts(docs, ["Steam Engine", "coal mine"]).take_all()
        assert any(h["concept"] == "steam_engine" and h["score"] == 1.0 for h in hits)
        assert all(h["doc_id"] == 1 for h in hits)

    def test_recursive_split(self):
        long_text = ("A sentence here. " * 30 + "\n\n") * 5
        docs = ray.data.from_arrow(pa.table({"doc_id": [1], "text": [long_text]}))
        rows = recursive_split(docs, chunk_size=200, overlap=40).take_all()
        assert len(rows) > 3
        assert all(len(r["split_text"]) <= 1800 for r in rows)
        # deterministic
        rows2 = recursive_split(docs, chunk_size=200, overlap=40).take_all()
        assert [r["split_text"] for r in rows] == [r["split_text"] for r in rows2]

    def test_coverage_report(self):
        nodes = ray.data.from_arrow(
            pa.table(
                {
                    "entity": ["steam_engine", "coal", "mill"],
                    "degree": [5, 1, 3],
                }
            )
        )
        rep = coverage_report(["Steam Engine", "railway", "coal"], nodes)
        assert rep["present"] == ["coal", "steam_engine"]
        assert rep["missing"] == ["railway"]
        assert rep["thin"] == ["coal"]


class TestCheckpoint:
    def test_partition_stable(self):
        assert partition_of("https://x/1", 8) == partition_of("https://x/1", 8)

    def test_write_resume_no_duplicates(self, tmp_path):
        tbl = pa.table(
            {
                "url": [f"https://e/{i}" for i in range(200)],
                "value": list(range(200)),
            }
        )
        out = str(tmp_path / "sink")
        full = ray.data.from_arrow(tbl)

        # First (interrupted) run: only rows of partitions {0,1,2} get
        # processed before the "crash".
        sink = PartitionedSink(out, num_partitions=8, key_col="url", run_id="r1")
        subset = full.filter(lambda r: partition_of(r["url"], 8) in (0, 1, 2))
        entries1 = sink.write(subset)
        assert {e["partition_id"] for e in entries1} <= {0, 1, 2}

        # Resume: pending filter drops finished partitions at the read.
        sink2 = PartitionedSink(out, num_partitions=8, key_col="url", run_id="r2")
        pending = sink2.filter_pending(full)
        pend_rows = pending.count()
        assert pend_rows < 200
        entries2 = sink2.write(pending)
        done = sink2.done_partitions()
        assert sum(e["rows"] for e in done.values()) == 200  # no dupes, no loss

        back = sink2.read_all()
        vals = sorted(r["value"] for r in back.select_columns(["value"]).take_all())
        assert vals == list(range(200))
        # lineage columns present
        cols = set(back.schema().names)
        assert {"partition_id", "run_id", "stage"} <= cols

    def test_rerun_is_noop(self, tmp_path):
        tbl = pa.table({"url": [f"u{i}" for i in range(50)], "v": list(range(50))})
        out = str(tmp_path / "sink2")
        sink = PartitionedSink(out, num_partitions=4, key_col="url")
        sink.write(ray.data.from_arrow(tbl))
        pending = sink.filter_pending(ray.data.from_arrow(tbl))
        assert pending.count() == 0


class TestMultimodal:
    def test_fake_decode_deterministic(self):
        ex = MediaFeatureExtractor(decoder="fake")
        h1, w1, f1, ok1 = ex._fake_decode(b"abc")
        h2, w2, f2, ok2 = ex._fake_decode(b"abc")
        assert (h1, w1) == (h2, w2)
        assert (f1 == f2).all()

    def test_real_decoders_stubbed(self):
        with pytest.raises(NotImplementedError):
            MediaFeatureExtractor(decoder="pil")
        with pytest.raises(NotImplementedError):
            MediaFeatureExtractor(decoder="ffmpeg")

    def test_pipeline_plumbing(self, sf_dir):
        media = synth_media_from_documents(sf_dir).limit(32)
        feats = extract_media_features(media, concurrency=2).take_all()
        assert len(feats) == 32
        assert len(feats[0]["features"]) == 64
        frames = frame_sample_stub(media).take_all()
        assert all(f["frame_index"] % 10 == 0 for f in frames)


class TestEmbedder:
    def test_hashing_embedder_properties(self, sf_dir):
        import numpy as np
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.embed import HashingEmbedder, embed_documents

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).limit(32)
        out = embed_documents(docs, concurrency=2).take_all()
        assert len(out) == 32
        assert len(out[0]["embedding"]) == 128
        # deterministic + unit norm
        e = HashingEmbedder()
        v1, v2 = e._vec("steam engine power"), e._vec("steam engine power")
        assert (np.array(v1) == np.array(v2)).all()
        assert abs(np.linalg.norm(v1) - 1.0) < 1e-9
        # similar texts more similar than disjoint texts
        sim_close = float(np.dot(e._vec("steam engine power"), e._vec("steam engine powers")))
        sim_far = float(np.dot(e._vec("steam engine power"), e._vec("coral reef fish")))
        assert sim_close > sim_far

    def test_embeddings_feed_knn_and_dedup(self, sf_dir):
        import numpy as np
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.dedup import embedding_dedup
        from ai_knowledge_graph_ray.stages.embed import embed_documents

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).limit(64)
        emb = embed_documents(docs, concurrency=2).rename_columns({"doc_id": "vec_id"}).materialize()
        dups = embedding_dedup(emb, threshold=0.999).take_all()
        # identical texts (if any) dedup; result is at least well-formed
        assert all(r["dup_of"] < r["vec_id"] for r in dups)


class TestLouvainAndBlend:
    """Reference visualization.py:186-227 parity: Louvain communities
    (with degree-mod-8 fallback) + centrality-blend node sizing, both
    count-gated driver computations over the distinct edge residue."""

    def _edges(self):
        import pyarrow as pa
        import ray.data

        cl_a = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
        cl_b = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
        bridge = [("a1", "b1")]
        pairs = cl_a + cl_b + bridge
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], pa.string()),
                    "dst": pa.array([p[1] for p in pairs], pa.string()),
                    "predicate": pa.array(["rel"] * len(pairs), pa.string()),
                    "inferred": pa.array([False] * len(pairs), pa.bool_()),
                    "chunk_id": pa.array([1] * len(pairs), pa.int32()),
                    "url": pa.array(["u"] * len(pairs), pa.string()),
                }
            )
        )

    def test_louvain_splits_cliques(self):
        from ai_knowledge_graph_ray.stages.materialize import louvain_communities

        labels = louvain_communities(self._edges())
        assert labels is not None
        a = {labels[f"a{i}"] for i in range(1, 5)}
        b = {labels[f"b{i}"] for i in range(1, 5)}
        assert len(a) == 1 and len(b) == 1 and a != b
        # deterministic across calls
        assert labels == louvain_communities(self._edges())

    def test_louvain_gate_returns_none(self):
        from ai_knowledge_graph_ray.stages.materialize import louvain_communities

        assert louvain_communities(self._edges(), max_edges=0) is None

    def test_blend_sizes_range_and_bridge_dominance(self):
        from ai_knowledge_graph_ray.stages.materialize import centrality_blend_sizes

        sizes = centrality_blend_sizes(self._edges())
        assert sizes is not None
        assert all(10.0 <= s <= 30.0 for s in sizes.values())
        # the bridge endpoints carry all betweenness -> biggest nodes
        top2 = sorted(sizes, key=sizes.get, reverse=True)[:2]
        assert set(top2) == {"a1", "b1"}

    def test_nodes_table_with_louvain_and_sizes(self):
        from ai_knowledge_graph_ray.stages.materialize import (
            centrality_blend_sizes,
            louvain_communities,
            nodes_table,
        )

        edges = self._edges()
        labels = louvain_communities(edges)
        rows = nodes_table(edges, labels, sizes=centrality_blend_sizes(edges)).take_all()
        assert len(rows) == 8
        comm = {r["entity"]: r["community"] for r in rows}
        assert comm["a2"] == comm["a3"] and comm["b2"] == comm["b3"]
        assert comm["a2"] != comm["b2"]


class TestKbCrawler:
    """S9 — reference graph_retriever.py:102-149 semantics over a tmp
    tree: recursive walk, extension filter, >2MB skip, utf-8 decode
    with undecodable-file drop, metadata columns."""

    def test_crawl(self, tmp_path):
        from ai_knowledge_graph_ray.sources.kb_crawler import crawl_knowledge_base

        kb = tmp_path / "kb"
        (kb / "sub").mkdir(parents=True)
        (kb / "a.md").write_text("# alpha doc")
        (kb / "sub" / "b.yaml").write_text("key: value")
        (kb / "c.txt").write_text("plain text")
        (kb / "skip.bin").write_bytes(b"\x00\x01")          # wrong extension
        (kb / "big.md").write_text("x" * (2 * 1024 * 1024 + 1))  # >2MB
        (kb / "bad.txt").write_bytes(b"\xff\xfe\x00bad")    # undecodable

        rows = crawl_knowledge_base([str(kb), str(tmp_path / "missing")]).take_all()
        by_name = {r["filename"]: r for r in rows}
        assert set(by_name) == {"a.md", "b.yaml", "c.txt"}
        assert by_name["a.md"]["text"] == "# alpha doc"
        assert by_name["b.yaml"]["source_dir"] == "sub"
        assert by_name["b.yaml"]["source"].endswith("sub/b.yaml")

    def test_all_dirs_missing(self, tmp_path):
        from ai_knowledge_graph_ray.sources.kb_crawler import crawl_knowledge_base

        ds = crawl_knowledge_base([str(tmp_path / "nope")])
        assert ds.take_all() == []


class TestPngCodec:
    """Dependency-free PNG codec: exact round-trips through every
    scanline filter, RGBA, unsupported-input rejection, and the real
    decode path through the actor-pool stage."""

    def _img(self, h=11, w=7, ch=3, seed=5):
        import numpy as np

        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)

    def test_roundtrip_all_filters(self):
        import numpy as np

        from ai_knowledge_graph_ray.functions.png import decode_png, encode_png

        img = self._img()
        for ftype in range(5):
            out = decode_png(encode_png(img, filter_type=ftype))
            np.testing.assert_array_equal(out, img, err_msg=f"filter {ftype}")

    def test_roundtrip_rgba_and_gradient(self):
        import numpy as np

        from ai_knowledge_graph_ray.functions.png import decode_png, encode_png

        rgba = self._img(ch=4)
        np.testing.assert_array_equal(decode_png(encode_png(rgba, filter_type=4)), rgba)
        # smooth gradient exercises wraparound-free prediction paths
        grad = np.stack(
            [np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))] * 3, axis=2
        )
        np.testing.assert_array_equal(decode_png(encode_png(grad, filter_type=3)), grad)

    def test_unsupported_rejected(self):
        import pytest as _pytest

        from ai_knowledge_graph_ray.functions.png import UnsupportedPngError, decode_png

        with _pytest.raises(UnsupportedPngError):
            decode_png(b"not a png at all")
        with _pytest.raises(UnsupportedPngError):
            decode_png(b"")

    def test_corrupt_rejected_with_documented_error(self):
        """Truncated IHDR / corrupt IDAT must raise the documented
        UnsupportedPngError, not leak struct.error / zlib.error."""
        import numpy as np
        import pytest as _pytest

        from ai_knowledge_graph_ray.functions.png import (
            UnsupportedPngError,
            decode_png,
            encode_png,
        )

        good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        with _pytest.raises(UnsupportedPngError):
            decode_png(good[:20])  # truncated mid-IHDR
        corrupt = bytearray(good)
        corrupt[40] ^= 0xFF  # flip a byte inside IDAT
        with _pytest.raises(UnsupportedPngError):
            decode_png(bytes(corrupt))

    def test_resize_nearest_exact(self):
        import numpy as np

        from ai_knowledge_graph_ray.stages.multimodal import resize_nearest

        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        out = resize_nearest(img, 2, 3)
        assert out.shape == (2, 3, 3)
        # index map: rows [0,2], cols [0,2,4]
        np.testing.assert_array_equal(out, img[[0, 2]][:, [0, 2, 4]])
        # upscale replicates pixels
        up = resize_nearest(img, 8, 12)
        assert up.shape == (8, 12, 3)
        np.testing.assert_array_equal(up[0, 0], img[0, 0])
        np.testing.assert_array_equal(up[7, 11], img[3, 5])

    def test_resize_stage_roundtrip(self, sf_dir):
        import numpy as np

        from ai_knowledge_graph_ray.functions.png import decode_png
        from ai_knowledge_graph_ray.stages.multimodal import (
            resize_images,
            synth_media_from_documents,
        )

        media = synth_media_from_documents(sf_dir, media_type="png").limit(8)
        rows = resize_images(media, target_size=(16, 16), concurrency=2).take_all()
        assert len(rows) == 8 and all(r["resize_ok"] for r in rows)
        for r in rows:
            img = decode_png(r["content"])
            assert img.shape[:2] == (16, 16)
        # corrupt payloads come back resize_ok=False, not a crash
        import pyarrow as _pa
        import ray.data as rd

        bad = rd.from_arrow(
            _pa.table(
                {
                    "media_id": _pa.array([1, 2], _pa.int64()),
                    "content": _pa.array([b"not a png", None], _pa.binary()),
                }
            )
        )
        out = resize_images(bad, concurrency=1).take_all()
        assert [r["resize_ok"] for r in out] == [False, False]

    def test_png_decoder_stage(self, sf_dir):
        from ai_knowledge_graph_ray.stages.multimodal import (
            extract_media_features,
            synth_media_from_documents,
        )

        media = synth_media_from_documents(sf_dir, media_type="png").limit(24)
        rows = extract_media_features(media, decoder="png", concurrency=2).take_all()
        assert len(rows) == 24
        assert all(r["decode_ok"] for r in rows)
        assert all(8 <= r["height"] <= 16 and 8 <= r["width"] <= 16 for r in rows)
        assert all(len(r["features"]) == 64 for r in rows)
        # features are real image statistics, not hashes: grid means in [0,1]
        assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"][:48])

    def test_corrupt_payload_flagged_not_crashed(self):
        import pyarrow as pa
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.multimodal import extract_media_features

        media = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1, 2], pa.int64()),
                    "media_type": pa.array(["png", "png"], pa.string()),
                    "content": pa.array([b"garbage", b""], pa.binary()),
                    "mime": pa.array(["image/png"] * 2, pa.string()),
                    "source_url": pa.array(["u1", "u2"], pa.string()),
                }
            )
        )
        rows = extract_media_features(media, decoder="png", concurrency=1).take_all()
        assert [r["decode_ok"] for r in rows] == [False, False]
        assert all(r["height"] == 0 for r in rows)


class TestStratifiedSplit:
    def _ds(self):
        import pyarrow as pa
        import ray.data as rd

        rows = [("a", i) for i in range(100)] + [("b", i) for i in range(10)]
        return rd.from_arrow(
            pa.table(
                {
                    "cls": pa.array([r[0] for r in rows], pa.string()),
                    "id": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    def test_per_stratum_proportions(self):
        from collections import Counter

        from ai_knowledge_graph_ray.stages.training import stratified_split

        out = stratified_split(
            self._ds(), "cls", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).take_all()
        assert len(out) == 110
        per = Counter((r["cls"], r["split"]) for r in out)
        assert per[("a", "train")] == 80 and per[("a", "val")] == 10 and per[("a", "test")] == 10
        # the small stratum is ALSO split 8/1/1 — a global shuffle could not guarantee this
        assert per[("b", "train")] == 8 and per[("b", "val")] == 1 and per[("b", "test")] == 1

    def test_deterministic_across_partitionings(self):
        from ai_knowledge_graph_ray.stages.training import stratified_split

        a = {
            (r["cls"], r["id"]): r["split"]
            for r in stratified_split(self._ds(), "cls", {"train": 0.9, "test": 0.1}).take_all()
        }
        b = {
            (r["cls"], r["id"]): r["split"]
            for r in stratified_split(
                self._ds().repartition(7), "cls", {"train": 0.9, "test": 0.1}
            ).take_all()
        }
        assert a == b
        c = {
            (r["cls"], r["id"]): r["split"]
            for r in stratified_split(
                self._ds(), "cls", {"train": 0.9, "test": 0.1}, seed=7
            ).take_all()
        }
        assert c != a  # seed changes the assignment


class TestNewGenerators:
    """Concept-definition, reasoning-chain, and comparison QA
    generators (reference training_generator semantics, generic
    wording)."""

    def _graph(self):
        import pyarrow as pa
        import ray.data as rd

        edge_rows = [
            ("sweep", "displacement", "precedes"),
            ("displacement", "gap", "creates"),
            ("momentum", "gap", "creates"),
            ("gap", "entry", "enables"),
        ]
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([r[0] for r in edge_rows], pa.string()),
                    "dst": pa.array([r[1] for r in edge_rows], pa.string()),
                    "predicate": pa.array([r[2] for r in edge_rows], pa.string()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(
                        ["sweep", "displacement", "gap", "momentum", "entry"], pa.string()
                    ),
                    "type": pa.array(
                        ["concept", "event", "concept", "concept", "concept"], pa.string()
                    ),
                    "attrs": pa.array(
                        ['{"definition": "a run through resting liquidity"}',
                         "{}", "{}", "{}", "{}"],
                        pa.string(),
                    ),
                }
            )
        )
        return nodes, edges

    def test_concept_qa(self):
        from ai_knowledge_graph_ray.stages.training import generate_concept_qa

        nodes, edges = self._graph()
        rows = generate_concept_qa(nodes, edges).take_all()
        by_cat = {}
        for r in rows:
            by_cat.setdefault(r["category"], []).append(r)
        # sweep has a definition; displacement gets type classification
        # (and a from-graph QA needs >=2 out-edges, which displacement lacks)
        defs = [r for r in by_cat.get("concept_definition", [])]
        assert any("Sweep is defined as" in r["output"] for r in defs)
        assert any(
            "classified as a event" in r["output"]
            for r in by_cat.get("concept_classification", [])
        )

    def test_concept_qa_from_graph_facts(self):
        import pyarrow as pa
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.training import generate_concept_qa

        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(["hub", "hub"], pa.string()),
                    "dst": pa.array(["a", "b"], pa.string()),
                    "predicate": pa.array(["uses", "creates"], pa.string()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(["hub", "a", "b"], pa.string()),
                    "type": pa.array(["concept"] * 3, pa.string()),
                    "attrs": pa.array(["{}"] * 3, pa.string()),
                }
            )
        )
        rows = generate_concept_qa(nodes, edges).take_all()
        fg = [r for r in rows if r["category"] == "concept_from_graph"]
        assert len(fg) == 1 and "- uses A" in fg[0]["output"] and "- creates B" in fg[0]["output"]

    def test_reasoning_chains(self):
        from ai_knowledge_graph_ray.stages.training import generate_reasoning_chain_qa

        _, edges = self._graph()
        rows = generate_reasoning_chain_qa(edges).take_all()
        outs = {r["output"] for r in rows}
        assert any("Sweep precedes Displacement" in o and "Displacement creates Gap" in o for o in outs)
        assert all(r["category"] == "reasoning_chain" for r in rows)
        # deterministic across runs
        again = {r["output"] for r in generate_reasoning_chain_qa(edges).take_all()}
        assert outs == again

    def test_comparisons(self):
        from ai_knowledge_graph_ray.stages.training import generate_comparison_qa

        _, edges = self._graph()
        rows = generate_comparison_qa(edges).take_all()
        ins = {r["instruction"] for r in rows}
        # displacement and momentum share the common neighbor 'gap'
        assert "Compare and contrast Displacement and Momentum." in ins
        assert all(r["category"] == "concept_comparison" for r in rows)

    def _cf_edges(self):
        import pyarrow as pa
        import ray.data as rd

        edge_rows = [
            ("displacement", "gap", "creates"),
            ("momentum", "thrust", "creates"),
            ("pressure", "flow", "creates"),
        ]
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([r[0] for r in edge_rows], pa.string()),
                    "dst": pa.array([r[1] for r in edge_rows], pa.string()),
                    "predicate": pa.array([r[2] for r in edge_rows], pa.string()),
                }
            )
        )

    def test_counterfactuals(self):
        from ai_knowledge_graph_ray.stages.training import generate_counterfactual_qa

        edges = self._cf_edges()
        rows = generate_counterfactual_qa(edges, seed=42).take_all()
        assert rows and all(r["category"] == "counterfactual_qa" for r in rows)
        # every negated statement names a NON-edge of that predicate,
        # and the answer restates the recorded fact
        edge_set = {
            ("displacement", "gap"),
            ("momentum", "thrust"),
            ("pressure", "flow"),
        }
        for r in (x for x in rows if "creates" in x["instruction"]):
            q = r["instruction"]
            assert q.startswith("Is it true that ")
            subj = q[len("Is it true that "):].split(" creates ")[0].lower()
            wrong = q.rstrip("?").split(" creates ")[1].lower()
            assert (subj, wrong) not in edge_set
            assert "No. The graph does not record" in r["output"]
        # seeded determinism: same seed same rows; different seed may
        # draw different wrong objects but never crashes
        again = generate_counterfactual_qa(edges, seed=42).take_all()
        assert sorted(r["instruction"] for r in rows) == sorted(
            r["instruction"] for r in again
        )
        # partition-independent
        repart = generate_counterfactual_qa(
            edges.repartition(3), seed=42
        ).take_all()
        assert sorted(r["instruction"] for r in rows) == sorted(
            r["instruction"] for r in repart
        )

    def test_anti_patterns(self):
        from ai_knowledge_graph_ray.stages.training import generate_anti_pattern_qa

        edges = self._cf_edges()
        rows = generate_anti_pattern_qa(edges, seed=42).take_all()
        assert rows and all(r["category"] == "anti_pattern_qa" for r in rows)
        # corrupted statements cross-pair two edges of one predicate
        # into a verified non-edge
        for r in (x for x in rows if "creates" in x["instruction"]):
            assert "wrong-pairing" in r["output"]
        again = generate_anti_pattern_qa(edges, seed=42).take_all()
        assert sorted(r["instruction"] for r in rows) == sorted(
            r["instruction"] for r in again
        )

    def test_model_selection(self):
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.training import (
            generate_model_selection_qa,
        )

        rules = rd.from_items(
            [
                {"model": "steam_engine", "requirement": "mill"},
                {"model": "steam_engine", "requirement": "pump"},
                {"model": "steam_engine", "requirement": "boiler"},
                {"model": "loom", "requirement": "thread"},
            ]
        )
        rows = generate_model_selection_qa(rules).take_all()
        by_cat = {}
        for r in rows:
            by_cat.setdefault(r["category"], []).append(r)
        reqs = {r["instruction"]: r for r in by_cat["model_requirements"]}
        assert "When does the Steam Engine model apply?" in reqs
        assert "When does the Loom model apply?" in reqs
        assert "  - Mill" in reqs["When does the Steam Engine model apply?"]["output"]
        # selection example only for models with >= 2 requirements,
        # built from the first three sorted requirements
        sel = by_cat.get("model_selection", [])
        assert len(sel) == 1
        assert (
            sel[0]["instruction"]
            == "These concepts are present: Boiler, Mill, Pump. Which model applies?"
        )
        assert "Steam Engine model is the best fit" in sel[0]["output"]
        # partition-independent
        again = generate_model_selection_qa(rules.repartition(3)).take_all()
        assert sorted(r["output"] for r in rows) == sorted(
            r["output"] for r in again
        )


class TestWavCodec:
    def test_roundtrip_mono_and_stereo(self):
        import numpy as np

        from ai_knowledge_graph_ray.functions.wav import decode_wav, encode_wav

        mono = (20000 * np.sin(np.arange(800) / 10.0)).astype(np.int16)
        out, rate = decode_wav(encode_wav(mono, rate=8000))
        assert rate == 8000 and out.shape == (800, 1)
        np.testing.assert_allclose(out[:, 0], mono / 32768.0, atol=1e-9)

        stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
        out2, _ = decode_wav(encode_wav(stereo, rate=16000))
        assert out2.shape == (800, 2)
        np.testing.assert_allclose(out2[:, 1], -mono / 32768.0, atol=1e-9)

    def test_unsupported_rejected(self):
        import pytest as _pytest

        from ai_knowledge_graph_ray.functions.wav import UnsupportedWavError, decode_wav

        with _pytest.raises(UnsupportedWavError):
            decode_wav(b"not audio")
        with _pytest.raises(UnsupportedWavError):
            decode_wav(b"")

    def test_resample_linear_exact(self):
        import numpy as np

        from ai_knowledge_graph_ray.stages.multimodal import resample_linear

        # downsample a ramp by 2: picks every other instant exactly
        ramp = np.arange(10, dtype=np.float64)[:, None] / 10.0
        half = resample_linear(ramp, 8000, 4000)
        assert half.shape == (5, 1)
        np.testing.assert_allclose(half[:, 0], ramp[::2, 0], atol=1e-12)
        # upsample: linear midpoints appear
        up = resample_linear(ramp, 8000, 16000)
        assert up.shape == (20, 1)
        np.testing.assert_allclose(up[1, 0], (ramp[0, 0] + ramp[1, 0]) / 2, atol=1e-12)

    def test_resample_stage_roundtrip(self, sf_dir):
        from ai_knowledge_graph_ray.functions.wav import decode_wav
        from ai_knowledge_graph_ray.stages.multimodal import (
            resample_audio,
            synth_media_from_documents,
        )

        media = synth_media_from_documents(sf_dir, media_type="wav").limit(8)
        rows = resample_audio(media, target_rate=4000, concurrency=2).take_all()
        assert len(rows) == 8 and all(r["resample_ok"] for r in rows)
        for r in rows:
            samples, rate = decode_wav(r["content"])
            assert rate == 4000 and len(samples) == r["height"]
        import pyarrow as _pa
        import ray.data as rd

        bad = rd.from_arrow(
            _pa.table(
                {
                    "media_id": _pa.array([1], _pa.int64()),
                    "content": _pa.array([b"junk"], _pa.binary()),
                }
            )
        )
        out = resample_audio(bad, concurrency=1).take_all()
        assert out[0]["resample_ok"] is False

    def test_wav_decoder_stage(self, sf_dir):
        from ai_knowledge_graph_ray.stages.multimodal import (
            extract_media_features,
            synth_media_from_documents,
        )

        media = synth_media_from_documents(sf_dir, media_type="wav").limit(16)
        rows = extract_media_features(media, decoder="wav", concurrency=2).take_all()
        assert len(rows) == 16
        assert all(r["decode_ok"] for r in rows)
        assert all(r["width"] == 8000 for r in rows)  # sample rate slot
        assert all(r["height"] >= 400 for r in rows)  # frame count slot
        # rms of a loud sine is substantial, first 4 features real-valued
        assert all(0.1 < r["features"][1] < 1.0 for r in rows)


class TestCompactSink:
    def test_compacts_preserving_rows_and_keys(self, tmp_path):
        import os

        import pandas as pd

        from ai_knowledge_graph_ray.state.checkpoint import (
            PartitionedSink,
            compact_sink,
        )

        src = PartitionedSink(str(tmp_path / "src"), num_partitions=32, key_col="url")
        df = pd.DataFrame(
            {"url": [f"u{i}" for i in range(300)], "subject": [f"s{i}" for i in range(300)]}
        )
        src.write(ray.data.from_pandas(df), stage="triples")
        n_src_files = len(list((tmp_path / "src").glob("part=*/data.parquet")))
        assert n_src_files > 4

        dst = compact_sink(
            src, str(tmp_path / "dst"), target_partitions=4, expected_stage="triples"
        )
        n_dst_files = len(list((tmp_path / "dst").glob("part=*/data.parquet")))
        assert n_dst_files <= 4
        back = dst.read_all(expected_stage="triples").to_pandas()
        assert len(back) == 300
        assert sorted(back["url"]) == sorted(df["url"])
        # source untouched, destination has its own manifest
        assert len(src.done_partitions()) == n_src_files
        assert os.path.exists(tmp_path / "dst" / "_manifest.json")

    def test_stage_guard_refuses_mixed(self, tmp_path):
        import pandas as pd
        import pytest as _pytest

        from ai_knowledge_graph_ray.state.checkpoint import (
            PartitionedSink,
            compact_sink,
        )

        src = PartitionedSink(str(tmp_path / "src2"), num_partitions=8, key_col="url")
        src.write(ray.data.from_pandas(pd.DataFrame({"url": ["a", "b"]})), stage="raw")
        with _pytest.raises(ValueError, match="stage"):
            compact_sink(
                src, str(tmp_path / "dst2"), target_partitions=2,
                expected_stage="triples",
            )
        import os

        assert not os.path.exists(tmp_path / "dst2")


class TestCompressionRatio:
    def test_pinned_values_and_determinism(self):
        import zlib

        import pandas as pd

        from ai_knowledge_graph_ray.stages.text_analysis import compression_ratio

        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([0, 1, 2, 3], dtype="int64"),
                "text": [
                    "spam " * 200,          # highly repetitive -> tiny ratio
                    "the quick brown fox jumps over the lazy dog",
                    "",                      # empty: 0 bytes
                    None,                    # null treated as ""
                ],
            }
        )
        out = (
            compression_ratio(ray.data.from_pandas(docs).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # exact zlib-level-6 twin computed in-test
        for i, s in enumerate(["spam " * 200,
                               "the quick brown fox jumps over the lazy dog", "", ""]):
            raw = s.encode()
            assert out.loc[i, "n_bytes"] == len(raw)
            assert out.loc[i, "n_compressed"] == len(zlib.compress(raw, 6))
            assert out.loc[i, "ratio_milli"] == len(zlib.compress(raw, 6)) * 1000 // max(
                1, len(raw)
            )
        # repetitive text compresses far below prose
        assert out.loc[0, "ratio_milli"] < 100 < out.loc[1, "ratio_milli"]


class TestNtriplesExport:
    def _parse(self, out_dir: str) -> set[tuple[str, str, str]]:
        import glob
        import re
        from urllib.parse import unquote

        pat = re.compile(r"^<([^>]*)> <([^>]*)> (<[^>]*>|\"(?:[^\"\\]|\\.)*\") \.$")
        got = set()
        for p in glob.glob(f"{out_dir}/*.nt"):
            with open(p, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    m = pat.match(line)
                    assert m, line
                    s = unquote(m.group(1).removeprefix("urn:kg:"))
                    pred = unquote(m.group(2).removeprefix("urn:kg:pred/"))
                    o = m.group(3)
                    if o.startswith("<"):
                        o = unquote(o[1:-1].removeprefix("urn:kg:"))
                    else:
                        o = (
                            o[1:-1]
                            .replace("\\n", "\n")
                            .replace("\\r", "\r")
                            .replace("\\t", "\t")
                            .replace('\\"', '"')
                            .replace("\\\\", "\\")
                        )
                    got.add((s, pred, o))
        return got

    def test_roundtrip_iris(self, tmp_path):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.sources.triples_io import write_ntriples

        df = pd.DataFrame(
            {
                "subject": ["steam engine", "a<b>c", "plain"],
                "predicate": ["powers", "rel with space", "p"],
                "object": ["factory", 'quote"bs\\nl\nend', "x"],
            }
        )
        out = str(tmp_path / "nt")
        n = write_ntriples(
            ray.data.from_pandas(df).repartition(2), out
        )
        assert n == 3
        got = self._parse(out)
        want = set(map(tuple, df.to_numpy()))
        assert got == want

    def test_literal_objects_escaped(self, tmp_path):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.sources.triples_io import write_ntriples

        df = pd.DataFrame(
            {
                "subject": ["s"],
                "predicate": ["p"],
                "object": ['line1\nline2\t"quoted" back\\slash'],
            }
        )
        out = str(tmp_path / "nt")
        n = write_ntriples(
            ray.data.from_pandas(df), out, object_as_literal=True
        )
        assert n == 1
        got = self._parse(out)
        assert got == {("s", "p", 'line1\nline2\t"quoted" back\\slash')}
