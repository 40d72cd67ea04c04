"""Incremental (delta) canonicalization: frozen aliases, norm-key
attach, novel election, and driver/scale gate equivalence."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.textnorm import normalize_entity_key
from ai_knowledge_graph_ray.stages.canonicalize import (
    elect_canonical,
    incremental_standardize,
    standardize_triples,
)


def _triples(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "subject": pa.array([r[0] for r in rows], pa.string()),
                "predicate": pa.array([r[1] for r in rows], pa.string()),
                "object": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def _spo(ds):
    return sorted(
        (r["subject"], r["predicate"], r["object"]) for r in ds.take_all()
    )


def _alias_dict(alias):
    if isinstance(alias, dict):
        return dict(alias)
    return {r["variant"]: r["standard"] for r in alias.take_all()}


class TestIncrementalStandardize:
    EXISTING = {"steam engine": "steam engine", "steam engines": "steam engine"}

    def test_frozen_alias_beats_new_frequency(self):
        # the new batch votes 5:1 for the PLURAL form — a fresh election
        # would flip the canonical; the frozen map must not
        rows = [("steam engines", "powers", f"mill {i}") for i in range(5)]
        rows += [("steam engine", "powers", "factory")]
        out, combined = incremental_standardize(_triples(rows), self.EXISTING)
        subs = {s for s, _, _ in _spo(out)}
        assert subs == {"steam engine"}
        assert _alias_dict(combined)["steam engines"] == "steam engine"

    def test_norm_key_attach_to_existing_canonical(self):
        # a NOVEL variant sharing the election key of a known variant
        # attaches to the OLD canonical instead of self-electing
        novel = "the steam engine"
        assert novel not in self.EXISTING
        assert normalize_entity_key(novel) == normalize_entity_key("steam engine")
        out, combined = incremental_standardize(
            _triples([(novel, "drives", "loom")]), self.EXISTING
        )
        assert _spo(out) == [("steam engine", "drives", "loom")]
        assert _alias_dict(combined)[novel] == "steam engine"

    def test_novel_entities_elected_among_themselves(self):
        rows = [
            ("spinning jenny", "spins", "cotton"),
            ("spinning jennies", "spins", "wool"),
            ("spinning jenny", "spins", "flax"),
        ]
        out, combined = incremental_standardize(_triples(rows), self.EXISTING)
        fresh = elect_canonical(
            [("spinning jenny", 2), ("spinning jennies", 1),
             ("cotton", 1), ("wool", 1), ("flax", 1)],
            second_pass=True,
        )
        got = _alias_dict(combined)
        for variant, std in fresh.items():
            assert got.get(variant, variant) == std
        assert {s for s, _, _ in _spo(out)} == {"spinning jenny"}

    def test_self_loops_dropped(self):
        out, _ = incremental_standardize(
            _triples([("steam engines", "is", "the steam engine"),
                      ("steam engine", "powers", "mill")]),
            self.EXISTING,
        )
        assert _spo(out) == [("steam engine", "powers", "mill")]

    def test_gate_path_equals_scale_path(self):
        rows = [
            ("steam engines", "powers", "mill"),
            ("the steam engine", "drives", "loom"),
            ("spinning jenny", "spins", "cotton"),
            ("spinning jennies", "spins", "wool"),
        ]
        # second pass off on BOTH paths (the scale path is first-pass
        # only, same documented limitation as standardize_triples)
        out_d, al_d = incremental_standardize(
            _triples(rows), self.EXISTING,
            {"standardization": {"second_pass": False}},
        )
        out_s, al_s = incremental_standardize(
            _triples(rows), self.EXISTING,
            {"standardization": {"residue_max_entities": 0}},
        )
        assert _spo(out_d) == _spo(out_s)
        d, s = _alias_dict(al_d), _alias_dict(al_s)
        # scale path returns only non-identity + existing rows; compare
        # the effective mapping on every entity either side mentions
        for k in set(d) | set(s):
            assert d.get(k, k) == s.get(k, k)

    def test_composes_with_full_standardize(self):
        # release 1: full build; release 2: incremental — known
        # entities stable, delta standardized with the combined map
        old = _triples(
            [("power loom", "weaves", "cloth"), ("power looms", "weave", "cloth")]
        )
        std_old, alias_old = standardize_triples(old, {})
        assert isinstance(alias_old, dict)
        new = _triples([("the power loom", "replaces", "handloom")])
        out, combined = incremental_standardize(new, alias_old)
        std_subjects = {s for s, _, _ in _spo(std_old)}
        inc_subjects = {s for s, _, _ in _spo(out)}
        assert inc_subjects <= std_subjects  # no new canonical for old entity
        assert _alias_dict(combined).keys() >= set(alias_old.keys())
