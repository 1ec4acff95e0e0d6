"""Connected components over near-duplicate pair graphs — turning
pairwise similarity hits into dedup *clusters* with one canonical
survivor each (what a training-data pipeline actually deletes by).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Each
large-star round hangs every node's larger neighbors off the smallest
node it can see; each small-star round re-hangs the smaller neighbors.
The alternation contracts path length multiplicatively, so convergence
takes a LOGARITHMIC number of rounds in practice (the paper proves
O(log^2 n) worst case and O(log n) under its two-phase analysis) —
unlike one-hop min-label propagation, whose radius grows by one per
round and needs O(diameter) joins. Near-dup graphs have tiny diameters
(clusters are near-cliques), so 2-4 rounds is typical either way; the
star alternation is what keeps long-chain graphs (diameter >
max_iterations) correct instead of silently mislabeled. If the edge
set still hasn't reached its star fixed point after ``max_iterations``
round pairs, the operator raises rather than returning wrong
components.

Scale notes: per-round state is one edge relation, shrinking toward
one (node, root) pair per non-root node — shuffles keyed by node id;
no driver-side structures grow with the data. Each round is
checkpointed (localCheckpoint) to cut the exponentially growing
lineage — on a cluster you would checkpoint to reliable storage
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round. Input: directed-canonical edge set
    (u > v). For every node u (over the symmetric closure), connect
    each STRICTLY LARGER neighbor v to m = min(N(u) + {u}). Output
    pairs are (larger node, smaller label), self-loop-free by
    construction (m <= u < v).

    The per-node minimum rides a window over the same partitioning the
    rows already need, instead of the groupBy + self-join shape this
    used through round 13 — one exchange of the symmetric closure
    rather than two (guide §2.4: two operations keyed the same way
    share one exchange). Values are identical: least(min(v) over u,
    u) == the old groupBy's least(min(v), first(u))."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame, input_canonical: bool = False) -> DataFrame:
    """One small-star round. Edges are directed large->small; for every
    node u, re-hang its smaller neighbors (and u itself) off
    m = min of those neighbors. Output stays directed large->small.

    Same one-exchange window shape as ``_large_star``. Pass
    ``input_canonical=True`` when the input is ALREADY distinct and
    directed large->small — ``_large_star`` output is, by construction
    — to skip a re-canonicalization exchange that would dedup nothing
    (the loop composes small(large(x)), so every in-loop call takes
    this path)."""
    if input_canonical:
        d = edges
    else:
        d = (
            edges.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    dm = d.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    return (
        dm.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(dm.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


#: Edge-count bound for the driver-local union-find fast path: at most
#: this many (u, v) rows are ever collected (~a few MB — the same class
#: of size-bounded driver work as a broadcast-join build side or the
#: IVF training sample). Above it, the distributed star loop runs
#: unchanged — at 100 TB a near-dup pair graph is corpus-scale and
#: always takes that path; the fast path only absorbs the many small
#: graphs whose star loop would be pure per-round job overhead.
DRIVER_CC_MAX_EDGES = 1 << 16


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 64,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Label every node of the undirected pair graph with the smallest
    node id in its component. Returns (node, component).

    Raises ``RuntimeError`` if the star fixed point is not reached
    within ``max_iterations`` large+small round pairs — loud failure
    instead of silently wrong components on adversarial graphs.
    Measured (scripts/scaling_probe.py, path graphs — the worst-case
    diameter): rounds ~= log2(diameter) + 2 (15/17/19 rounds at
    10k/40k/160k nodes), so the default 64 covers diameters near
    2^60; an earlier default of 20 capped out at a mere ~300k-node
    path. Rounds past the fixed point never execute, so the generous
    cap is free on normal graphs.

    Nodes appearing only as isolated ids are the caller's concern —
    feed the full id set through ``assign_components`` to also label
    singletons."""
    labels, _ = connected_components_with_rounds(
        pairs, src_col, dst_col, max_iterations, driver_max_edges
    )
    return labels


def _driver_union_find(edge_rows) -> dict:
    """Exact min-label connected components over collected edges: plain
    union-find with path halving; every node's label is the SMALLEST
    node id in its component — precisely the star loop's fixed point."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for u, v in edge_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by label order so the root IS the component minimum
            # (node ids are totally ordered: the star loop already
            # relies on < / greatest/least over them)
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {n: find(n) for n in parent}


def connected_components_with_rounds(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 64,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> tuple[DataFrame, int]:
    """:func:`connected_components` plus the number of large+small star
    round pairs it took to converge — the observable for the O(log n)
    round-growth claim (scripts/scaling_probe.py measures it against
    doubling graph sizes; it passes ``driver_max_edges=0`` so the
    distributed loop is what gets measured).

    Small graphs (<= ``driver_max_edges`` distinct canonical edges — the
    count is already in hand for the convergence test) skip the star
    loop entirely: the edges are collected and labeled by an exact
    driver-side union-find, identical output by construction (both
    paths label every node with the smallest id in its component).
    Rationale: the star loop costs one driver-coordinated job PER
    ROUND, and on the sub-second graphs every near-dup query produces
    at sub-TB scale that fixed job overhead dominates end-to-end
    latency by 10x (measured: the 568-edge semdedup graph paid ~6 s of
    driver-side planning/scheduling across its rounds for ~0.2 s of
    task work). The collect is size-bounded exactly like a broadcast
    hash join's build side; ``rounds`` is reported as 0 on this path."""
    rounds = 0
    # lazy localCheckpoint + count: ONE job both materializes the
    # checkpoint (truncating the possibly-expensive pair-generation
    # lineage out of the loop) and returns the edge count the
    # convergence test needs — the eager-checkpoint-then-count shape
    # this used through round 14 paid a second pass per round
    edges = (
        pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()  # no edges: nothing to do
    if 0 < n_edges <= driver_max_edges:
        import pandas as pd
        from pyspark.sql import types as T

        labels = _driver_union_find(
            (r[0], r[1]) for r in edges.select("u", "v").collect()
        )
        id_type = edges.schema["u"].dataType
        spark = pairs.sparkSession
        # pandas + Arrow path: the result lands as JVM-side Arrow
        # batches; a plain list-of-tuples createDataFrame would ship
        # pickled rows that every downstream scan re-decodes through a
        # Python worker stage
        out = spark.createDataFrame(
            pd.DataFrame(
                {"node": list(labels.keys()),
                 "component": list(labels.values())}
            ),
            schema=T.StructType([
                T.StructField("node", id_type),
                T.StructField("component", id_type),
            ]),
        )
        return out, 0
    converged = n_edges == 0
    for _ in range(max_iterations):
        if converged:
            break
        rounds += 1
        new_edges = _small_star(
            _large_star(edges), input_canonical=True
        ).localCheckpoint(eager=False)
        # fixed point = identical edge set. Both sides are distinct and
        # directed-canonical, so set equality is count equality plus an
        # empty difference. The previous round's count is remembered
        # (n_edges) instead of re-counted, and the count doubles as the
        # checkpoint's materialization action — one job per round.
        n_new = new_edges.count()
        converged = (
            n_new == n_edges
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        edges, n_edges = new_edges, n_new
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach its star fixed point in "
            f"{max_iterations} large/small-star rounds — raising instead of "
            "returning possibly-wrong components"
        )
    # at the fixed point the edge set is a star forest: one (node, root)
    # edge per non-root node; roots label themselves
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component")).unionByName(
        edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
    ).distinct()
    return labels, rounds


def assign_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Component id for EVERY id (singletons get themselves)."""
    comp = connected_components(pairs, src_col, dst_col)
    return (
        ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Keep one row per near-dup cluster: the row whose id equals the
    component label (the smallest id in the cluster) — deterministic
    canonical-survivor dedup."""
    comp = assign_components(df.select(id_col), pairs, id_col, src_col, dst_col)
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")
