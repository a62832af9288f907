"""Connected components over duplicate-pair graphs: min-label fixpoint
vs a pure-Python union-find oracle, transitive chains, string ids,
singleton handling in dedup_clusters."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from commoncrawl_spark.operators.graph import connected_components, dedup_clusters


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for node in list(parent):
        comp.setdefault(find(node), []).append(node)
    out = {}
    for members in comp.values():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


@pytest.mark.spark
def test_components_match_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find_labels(edges)
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(
            spark.createDataFrame(edges, "a long, b long")
        ).collect()
    }
    assert got == want


@pytest.mark.spark
def test_transitive_chain_is_one_cluster(spark):
    """A chain 0-1-2-...-9 has diameter 9: every node must still land in
    cluster 0 (the greedy pairwise rule can't see this; the fixpoint
    must)."""
    edges = [(i, i + 1) for i in range(9)]
    got = connected_components(
        spark.createDataFrame(edges, "a long, b long")
    ).collect()
    assert {r["id"] for r in got} == set(range(10))
    assert {r["cluster"] for r in got} == {0}


@pytest.mark.spark
def test_long_chain_converges_within_guard(spark):
    """Pointer doubling makes iterations logarithmic in diameter: a
    120-node path (worst case for plain neighbor propagation, which
    would need ~119 rounds) must fully converge inside max_iters=20."""
    edges = [(i, i + 1) for i in range(119)]
    got = connected_components(
        spark.createDataFrame(edges, "a long, b long"), max_iters=20
    ).collect()
    assert {r["cluster"] for r in got} == {0}
    assert len(got) == 120


@pytest.mark.spark
def test_components_string_ids(spark):
    """sha1-hex-style string ids: labels are the lexicographic minimum."""
    edges = [("cc", "bb"), ("bb", "aa"), ("ff", "ee")]
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(
            spark.createDataFrame(edges, "a string, b string")
        ).collect()
    }
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa", "ee": "ee", "ff": "ee"}


@pytest.mark.spark
def test_dedup_clusters_covers_singletons(spark):
    corpus = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "a long, b long")
    got = {r["doc_id"]: r["cluster"] for r in dedup_clusters(pairs, corpus).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 6, 7: 7}
    # transitive keep set: one representative per component
    keep = {d for d, c in got.items() if d == c}
    assert keep == {0, 1, 2, 4, 6, 7}
