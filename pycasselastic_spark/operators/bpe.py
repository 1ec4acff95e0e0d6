"""BPE merge induction — tokenizer TRAINING as a Spark job.

The classic Sennrich et al. 2016 byte-pair-encoding loop: count word
frequencies once, then repeatedly (1) count adjacent symbol pairs
across the word table weighted by word frequency, (2) take the most
frequent pair, (3) merge its non-overlapping occurrences left-to-right
in every word. The merge table IS the tokenizer — the vocabulary
induction step of every modern LLM data pipeline. Reference parity:
none (the reference is a sync daemon); this is SURVEY.md §2.2
training-data build-out alongside the token-count / packing ops.

Scale shape (the property that makes BPE trainable on 100 TB): the
corpus is touched ONCE to build the word-frequency table; every merge
round then operates on that VOCAB-bounded relation (distinct words,
not corpus rows) — pair counting is a partial-aggregated groupBy,
re-segmentation a row-local literal string replace. The only driver
traffic is one (pair, count) row per round — the same bounded-scalar
pattern as the IVF centroid fetch; the loop is inherently sequential
in k (each round's counts depend on the previous merge).

Determinism: counts are exact BIGINTs; the best pair breaks ties by
(count desc, left asc, right asc); re-segmentation uses literal
non-overlapping left-to-right string replacement on a DOUBLE-space
symbol encoding — ``'  a  n  '`` with pattern ``' a  n '`` — so the
pattern consumes ONE boundary space from each side and consecutive
non-overlapping pair occurrences share no characters (``banana``
merges BOTH ``an``s in one pass, ``aaaa`` -> ``aa aa``, exactly the
Sennrich greedy law; a single-space encoding silently skips every
second occurrence — round-14 review finding). SQL ``replace`` shares
these semantics in both engines, so the whole training loop replays
in SQL with unrolled rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass: ``(seg, freq)`` — each distinct whitespace
    word DOUBLE-space-delimited into characters (the initial BPE
    segmentation; the double separator is what makes one literal
    replace per round equal greedy non-overlapping pair merging),
    weighted by corpus frequency."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            F.concat(
                F.lit("  "),
                F.array_join(F.split(F.col("w"), ""), "  "),
                F.lit("  "),
            ).alias("seg"),
            "freq",
        )
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    syms = F.split(F.trim(F.col("seg")), "  ")
    return (
        seg.select(
            "freq",
            F.posexplode(F.slice(syms, 1, F.size(syms) - 1))
             .alias("pos", "l"),
            syms.alias("_s"),
        )
        .select(
            "freq", "l",
            F.element_at(F.col("_s"), F.col("pos") + 2).alias("r"),
        )
        .groupBy("l", "r")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, text_col: str, k_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Induce ``k_merges`` BPE merge rules from the corpus. Returns
    the merge table ``[(rank, left, right, merged, cnt)]`` in rank
    order — ``cnt`` is the pair's weighted count at selection time.
    Raises when the corpus runs out of mergeable pairs before
    ``k_merges`` (a silent short table would corrupt a tokenizer
    built from it)."""
    if k_merges < 1:
        raise ValueError(f"bpe_train k_merges {k_merges!r} (>= 1)")
    seg = word_freq_table(docs, text_col)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(int(k_merges)):
        best = (
            _pair_counts(seg)
            .orderBy(
                F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"corpus exhausted after {rank} merges "
                f"(k_merges={k_merges}) — no adjacent pairs left"
            )
        row = best[0]
        left, right, cnt = row["l"], row["r"], row["cnt"]
        merges.append((rank, left, right, left + right, cnt))
        seg = seg.select(
            F.replace(
                F.col("seg"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ).alias("seg"),
            "freq",
        )
        # each round's plan would otherwise stack the previous
        # round's pair-count subtree; localCheckpoint truncates the
        # lineage so round r reads a materialized vocab-sized table
        seg = seg.localCheckpoint(eager=False)
    return merges


def bpe_train_df(
    docs: DataFrame, text_col: str, k_merges: int
) -> DataFrame:
    """The merge table as a DataFrame ``(rank, left, right, merged,
    cnt)`` — the catalog/driver-facing shape of ``bpe_train``."""
    spark = docs.sparkSession
    return spark.createDataFrame(
        bpe_train(docs, text_col, k_merges),
        "merge_rank long, left_sym string, right_sym string, "
        "merged string, cnt long",
    )


def bpe_segment(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, str, int]],
) -> DataFrame:
    """Apply a trained merge table: ``(id, word_pos, tokens)`` — each
    whitespace word of each doc re-segmented by replaying the merges
    in rank order (the BPE ENCODE step, greedy by training rank).
    Row-local string work; the merge table rides as k literal
    replaces inside one whole-stage-codegen projection."""
    out = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("word_pos", "w"),
    ).filter(F.col("w") != "")
    seg = F.concat(
        F.lit("  "), F.array_join(F.split(F.col("w"), ""), "  "),
        F.lit("  ")
    )
    for _rank, left, right, merged, _cnt in merges:
        seg = F.replace(seg, F.lit(f" {left}  {right} "),
                        F.lit(f" {merged} "))
    return out.select(
        id_col, "word_pos", F.split(F.trim(seg), "  ").alias("tokens")
    )
