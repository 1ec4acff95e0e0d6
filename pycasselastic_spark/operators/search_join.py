"""ES join-field (parent/child) queries: ``has_child`` / ``has_parent``.

ES models parent/child with a ``join`` mapping field: every doc in ONE
index carries its relation name, and child docs carry their parent's
id (parent and children co-routed to one shard — exactly the co-
partitioning a distributed join wants). The Spark-first realization:
the join field is a (id, join_name, parent) relation riding the same
doc-id partitioning as the index; ``has_child`` is a bounded
hit-side equi-join rolled up to parents, ``has_parent`` the inverse
propagation. Reference parity: the reference engine has no
parent/child surface (pyCassElastic.py:366-397 is flat term queries);
this is ES API build-out (SURVEY.md §2.2 absent-category).

Score laws (all Q20 integers, partitioning-independent):
  * ``has_child``: score_mode ``none`` -> constant one Q20 unit
    (filter-context semantics), ``sum``/``max``/``min`` exact over
    the children's Q20 scores, ``avg`` Q20-floored.
  * ``has_parent``: ``score=True`` -> the parent's Q20 score
    inherited by every child; ``score=False`` -> constant one Q20.

Plan shape (100 TB posture): one pruned postings probe scores the
query side; one pushed-filter scan of the join relation restricts to
the named type; the equi-join keys are doc ids on both sides (the
partitioning the corpus already has), followed by a map-side partial
groupBy for the rollup. No corpus-sized shuffle beyond the hit set,
no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import Q20, PostingsIndex
from pycasselastic_spark.operators.search_probes import _bm25_scored

_SCORE_MODES = ("none", "sum", "max", "min", "avg")


def _validate_join_field(
    index: PostingsIndex, join_field: DataFrame
) -> str:
    id_col = index.id_col
    need = {id_col, "join_name", "parent"}
    missing = need - set(join_field.columns)
    if missing:
        raise ValueError(
            f"join_field relation missing columns {sorted(missing)} "
            f"(expected ({id_col}, join_name, parent))"
        )
    return id_col


def _child_types(relations: dict) -> dict[str, str]:
    """Flatten the ES join mapping {parent: child|[children]} into
    child -> parent."""
    out: dict[str, str] = {}
    for parent, children in relations.items():
        if isinstance(children, str):
            children = [children]
        for c in children:
            if c in out:
                raise ValueError(
                    f"join relation child {c!r} declared under two "
                    "parents (ES allows one parent per child type)"
                )
            out[c] = parent
    return out


def has_child_search(
    index: PostingsIndex,
    join_field: DataFrame,
    relations: dict,
    child_type: str,
    child_terms: list[str],
    score_mode: str = "none",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``has_child``: return PARENT docs having at least one
    ``child_type`` child matching the inner query, scored per
    ``score_mode`` over the children's BM25 scores. Output
    ``(parent_id, n_children, score_q20)`` ranked (score desc,
    parent asc), first ``k``. ``n_children`` counts MATCHING
    children (the min_children predicate's input).
    """
    id_col = _validate_join_field(index, join_field)
    ctp = _child_types(relations)
    if child_type not in ctp:
        raise ValueError(
            f"has_child type {child_type!r} not a declared child "
            f"(relations: {relations})"
        )
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"has_child score_mode {score_mode!r} "
            f"(supported: {list(_SCORE_MODES)})"
        )
    parent_type = ctp[child_type]
    children = join_field.filter(
        F.col("join_name") == child_type
    ).select(id_col, "parent")
    scored = _bm25_scored(index, child_terms, k1, b)
    hits = scored.join(children, id_col)
    if score_mode == "none":
        agg_score = F.lit(1 * Q20).cast("long")
    elif score_mode == "sum":
        agg_score = F.sum("score_q20").cast("long")
    elif score_mode == "max":
        agg_score = F.max("score_q20").cast("long")
    elif score_mode == "min":
        agg_score = F.min("score_q20").cast("long")
    else:
        # children's scores are Q20 ints; the mean re-floors once
        agg_score = F.floor(F.avg("score_q20")).cast("long")
    per_parent = hits.groupBy("parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_children"),
        agg_score.alias("score_q20"),
    )
    parents = join_field.filter(
        F.col("join_name") == parent_type
    ).select(F.col(id_col).alias("parent"))
    return (
        per_parent.join(parents, "parent")
        .select(
            F.col("parent").alias("parent_id"),
            "n_children",
            "score_q20",
        )
        .orderBy(F.col("score_q20").desc(), F.col("parent_id").asc())
        .limit(k)
    )


def has_parent_search(
    index: PostingsIndex,
    join_field: DataFrame,
    relations: dict,
    parent_type: str,
    parent_terms: list[str],
    score: bool = True,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``has_parent``: return CHILD docs whose parent matches the
    inner query. ``score=True`` propagates the parent's BM25 Q20
    score to each child (ES's score mode ``score``); ``score=False``
    is the filter-context constant. Output ``(child_id, parent_id,
    score_q20)`` ranked (score desc, child asc), first ``k``."""
    id_col = _validate_join_field(index, join_field)
    ctp = _child_types(relations)
    if parent_type not in relations:
        raise ValueError(
            f"has_parent parent_type {parent_type!r} not a declared "
            f"parent (relations: {relations})"
        )
    child_names = sorted(c for c, p in ctp.items() if p == parent_type)
    scored = _bm25_scored(index, parent_terms, k1, b)
    parents = join_field.filter(
        F.col("join_name") == parent_type
    ).select(F.col(id_col).alias("parent"))
    parent_hits = (
        scored.withColumnRenamed(id_col, "parent")
        .join(parents, "parent")
        .select("parent", "score_q20")
    )
    children = join_field.filter(
        F.col("join_name").isin(child_names)
    ).select(F.col(id_col).alias("child_id"), "parent")
    out_score = (
        F.col("score_q20") if score else F.lit(1 * Q20)
    ).cast("long")
    return (
        children.join(parent_hits, "parent")
        .select(
            "child_id",
            F.col("parent").alias("parent_id"),
            out_score.alias("score_q20"),
        )
        .orderBy(F.col("score_q20").desc(), F.col("child_id").asc())
        .limit(k)
    )
