"""Apriori frequent triples: brute-force twin, pruned vs unpruned
equivalence, planted itemset, basket cap."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.cooccur import frequent_triples


def _brute(df, minsup):
    sup: dict = {}
    for _, g in df.drop_duplicates().groupby("basket"):
        for t in combinations(sorted(g["item"]), 3):
            sup[t] = sup.get(t, 0) + 1
    rows = [(a, b, c, s) for (a, b, c), s in sup.items() if s >= minsup]
    return (
        pd.DataFrame(rows, columns=["item_a", "item_b", "item_c", "support"])
        .sort_values(["item_a", "item_b", "item_c"])
        .reset_index(drop=True)
        .astype("int64")
    )


def _rand_baskets(rng, n_baskets, catalog, basket_sz):
    rows = []
    for b in range(n_baskets):
        for it in rng.choice(catalog, size=basket_sz, replace=False):
            rows.append((b, int(it)))
    return pd.DataFrame(rows, columns=["basket", "item"])


class TestFrequentTriples:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(41)
        df = _rand_baskets(rng, 120, np.arange(15), 5)  # dense -> rich supports
        want = _brute(df, 3)
        assert len(want) > 5  # fixture sanity: non-trivial answer set
        got = (
            frequent_triples(
                ray.data.from_pandas(df).repartition(4), "basket", "item", minsup=3
            )
            .to_pandas()
            .sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True)
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got, want)

    def test_pruned_equals_unpruned(self):
        rng = np.random.RandomState(42)
        df = _rand_baskets(rng, 80, np.arange(30), 4)  # sparse -> pruning bites
        ds = ray.data.from_pandas(df).repartition(3)
        pruned = (
            frequent_triples(ds, "basket", "item", minsup=2)
            .to_pandas().sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True)
        )
        unpruned = (
            frequent_triples(
                ds, "basket", "item", minsup=2, pair_broadcast_max=0
            )
            .to_pandas().sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(pruned, unpruned)

    def test_planted_itemset(self):
        rng = np.random.RandomState(43)
        noise = _rand_baskets(rng, 40, np.arange(100, 400), 4)
        planted = pd.DataFrame(
            [(1000 + b, it) for b in range(7) for it in (1, 2, 3)],
            columns=["basket", "item"],
        )
        df = pd.concat([noise, planted], ignore_index=True)
        got = frequent_triples(
            ray.data.from_pandas(df), "basket", "item", minsup=7
        ).to_pandas()
        assert len(got) == 1
        assert got.iloc[0].tolist() == [1, 2, 3, 7]

    def test_basket_cap_drops_megabasket(self):
        mega = pd.DataFrame({"basket": 0, "item": np.arange(50)})
        small = pd.DataFrame(
            [(b, it) for b in (1, 2) for it in (7, 8, 9)],
            columns=["basket", "item"],
        )
        df = pd.concat([mega, small], ignore_index=True)
        got = frequent_triples(
            ray.data.from_pandas(df), "basket", "item",
            minsup=2, max_basket_size=10,
        ).to_pandas()
        # the mega-basket is dropped entirely; only the planted triple
        assert got[["item_a", "item_b", "item_c"]].values.tolist() == [[7, 8, 9]]


class TestAssociationRules:
    def test_matches_bruteforce(self):
        from ai_knowledge_graph_ray.stages.cooccur import association_rules

        rng = np.random.RandomState(44)
        df = _rand_baskets(rng, 100, np.arange(12), 5)
        # brute force
        pair_sup: dict = {}
        tri_sup: dict = {}
        for _, g in df.drop_duplicates().groupby("basket"):
            items = sorted(g["item"])
            for p in combinations(items, 2):
                pair_sup[p] = pair_sup.get(p, 0) + 1
            for t in combinations(items, 3):
                tri_sup[t] = tri_sup.get(t, 0) + 1
        want_rows = []
        for (a, b, c), s in tri_sup.items():
            if s < 3:
                continue
            for (x, y), z in (((a, b), c), ((a, c), b), ((b, c), a)):
                want_rows.append((x, y, z, s, 1000 * s // pair_sup[(x, y)]))
        want = (
            pd.DataFrame(
                want_rows,
                columns=["ant_a", "ant_b", "cons", "support", "conf_milli"],
            )
            .sort_values(["ant_a", "ant_b", "cons"]).reset_index(drop=True)
            .astype("int64")
        )
        got = (
            association_rules(
                ray.data.from_pandas(df).repartition(4),
                "basket", "item", minsup=3,
            )
            .to_pandas().sort_values(["ant_a", "ant_b", "cons"])
            .reset_index(drop=True).astype("int64")
        )
        assert len(want) > 10  # fixture sanity
        pd.testing.assert_frame_equal(got, want)

    def test_confidence_bounds_and_empty(self):
        from ai_knowledge_graph_ray.stages.cooccur import association_rules

        df = pd.DataFrame(
            [(b, it) for b in range(4) for it in (1, 2, 3)]
            + [(10, 1), (10, 2)],  # pair (1,2) also appears without 3
            columns=["basket", "item"],
        )
        got = association_rules(
            ray.data.from_pandas(df), "basket", "item", minsup=4
        ).to_pandas().set_index(["ant_a", "ant_b", "cons"])
        # {1,2} -> 3: sup 4, pair (1,2) sup 5 -> conf 800
        assert got.loc[(1, 2, 3), "conf_milli"] == 800
        # {1,3} -> 2 and {2,3} -> 1: pair sup 4 -> conf 1000
        assert got.loc[(1, 3, 2), "conf_milli"] == 1000
        assert got.loc[(2, 3, 1), "conf_milli"] == 1000
        empty = association_rules(
            ray.data.from_pandas(df), "basket", "item", minsup=50
        )
        assert empty.count() == 0
