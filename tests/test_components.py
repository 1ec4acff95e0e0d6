"""Connected-components / cluster-dedup tests, including a plain-Python
union-find golden check on the real near-dup graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from pycasselastic_spark.operators import dedup as D
from pycasselastic_spark.operators.components import (
    assign_components,
    connected_components,
    dedup_by_components,
)
from pycasselastic_spark.sources.corpus import load_table


def test_chain_and_islands(spark):
    """A 5-node chain (worst-case diameter) plus a 2-clique."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_singletons_label_themselves(spark):
    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1)], ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["component"]
        for r in assign_components(ids, pairs, "doc_id").collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4, 5: 5}


def test_matches_union_find_on_real_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id per component
    comp_min = {}
    for i in ids:
        r = find(i)
        comp_min.setdefault(r, i if i < r else r)
        comp_min[r] = min(comp_min[r], i)
    golden_survivors = {i for i in ids if comp_min[find(i)] == i}

    survivors = {
        r["doc_id"] for r in dedup_by_components(docs, pairs, "doc_id").collect()
    }
    assert survivors == golden_survivors
    assert len(survivors) < len(ids)  # the corpus has planted near-dups


def test_long_path_converges_in_log_rounds(spark):
    """A path graph with diameter 200 — far beyond any per-round
    propagation budget. Large-star/small-star must still converge
    within the default 20 round pairs (the alternation contracts path
    length multiplicatively; one-hop min-label propagation would need
    200 rounds and previously returned WRONG components silently)."""
    n = 201
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n)}


def test_nonconvergence_raises_loudly(spark):
    """With max_iterations too small for the graph, the operator must
    raise instead of returning mislabeled components
    (driver_max_edges=0 forces the distributed star loop — the
    round-15 small-graph fast path needs no iterations)."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000 - 1)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="star fixed point"):
        connected_components(pairs, max_iterations=1, driver_max_edges=0)


def test_driver_fast_path_matches_star_loop(spark):
    """Round-15 optimization pin: the bounded driver-side union-find
    fast path must label EXACTLY like the distributed star loop — same
    (node, component) set, same column types — on a graph mixing a
    long path, cliques, islands and duplicate/reversed edges."""
    import random

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(50)]           # path
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a)]
    edges += [(200, 201), (300, 301), (301, 300), (300, 301)]  # dup/rev
    edges += [(rng.randrange(400, 450), rng.randrange(400, 450))
              for _ in range(120)]                     # random blob
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    fast = connected_components(pairs)  # small graph -> driver path
    slow = connected_components(pairs, driver_max_edges=0)
    assert fast.schema == slow.schema
    assert {tuple(r) for r in fast.collect()} == {
        tuple(r) for r in slow.collect()
    }
