"""Lightweight text classification for corpus curation: multinomial
Naive Bayes trained in ONE pass over the corpus, scored with a
posting-style join — the fasttext-shaped "train a cheap classifier on
a weak label, score everything" step of every large-scale pipeline
(CCNet/GPT-3-style quality filtering, language-ID distillation,
domain routing). Reference parity: the reference engine ships no
classifier (pyCassElastic.py is a sync daemon); this is SURVEY.md
§2.2 training-data build-out alongside DSIR/CCNet sampling.

Determinism (the engine's fixed-point law): every count is an exact
BIGINT from one tokenize pass; each term's log-likelihood-ratio
weight is ONE fixed IEEE-double expression over those exact integers
(identical rounding cross-engine), Q30-floored to a long; per-doc
scores are exact integer sums of Q30 weights over token OCCURRENCES
— partitioning-independent, replayable in SQL.

Scale shape: train = one tokenize pass + a (term, label) partial
aggregation (vocab-bounded output); score = an equi-join of the
token stream to the vocab-sized weight relation on ``term`` followed
by a per-doc partial sum. No driver-side loops; the three corpus
scalars (class masses, vocab size, doc counts) ride as broadcast
one-row relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q30 = 1 << 30


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def nb_train(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    positive: "F.Column",
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing on whitespace
    tokens against a boolean ``positive`` label column expression.

    Returns ``(weights, consts)``:
      * ``weights``: (term, w_q30) — Q30-floored
        ``ln((c_pos+1)/(M_pos+V)) - ln((c_neg+1)/(M_neg+V))`` per
        seen term (M = class token mass, V = vocab size);
      * ``consts``: one broadcastable row (oov_q30, prior_q30) — the
        unseen-term weight (add-one makes it a constant) and the
        class-prior log-ratio ``ln(n_pos_docs / n_neg_docs)``.

    NULL labels are excluded from training (and from the doc-count
    prior)."""
    labeled = docs.withColumn("_pos", positive).filter(
        F.col("_pos").isNotNull()
    )
    # carry the label THROUGH the explode — re-joining the token
    # stream to the corpus on id just to recover a column the row
    # already had would add a corpus-scale shuffle (round-14 review
    # finding)
    toks = labeled.select(
        "_pos",
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0))
         .cast("long").alias("c_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1))
         .cast("long").alias("c_neg"),
    )
    scalars = per_term.agg(
        F.sum("c_pos").cast("long").alias("m_pos"),
        F.sum("c_neg").cast("long").alias("m_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    dcounts = labeled.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0))
         .cast("long").alias("d_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1))
         .cast("long").alias("d_neg"),
    )

    def _w(c_pos, c_neg):
        return F.floor(
            (F.log((c_pos + F.lit(1.0)) / (F.col("m_pos") + F.col("v")))
             - F.log((c_neg + F.lit(1.0)) / (F.col("m_neg") + F.col("v"))))
            * F.lit(float(Q30))
        ).cast("long")

    weights = (
        per_term.crossJoin(F.broadcast(scalars))
        .select("term", _w(F.col("c_pos"), F.col("c_neg")).alias("w_q30"))
    )
    consts = (
        scalars.crossJoin(F.broadcast(dcounts))
        .select(
            _w(F.lit(0), F.lit(0)).alias("oov_q30"),
            F.floor(
                F.log(F.col("d_pos").cast("double")
                      / F.col("d_neg").cast("double"))
                * F.lit(float(Q30))
            ).cast("long").alias("prior_q30"),
        )
    )
    return weights, consts


def nb_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    consts: DataFrame,
) -> DataFrame:
    """Score docs with trained NB weights: ``(id, n_tokens,
    score_q30)`` where score = prior + Σ over token occurrences of
    the term's Q30 weight (unseen terms take the add-one OOV
    constant). Positive score = classifier prefers the positive
    class. Exact integer arithmetic end-to-end after training's one
    float expression per term. Docs with NO tokens score exactly the
    prior (ES of this op: the empty document is all-prior)."""
    # one pass: per-doc weight sums, then an outer join FROM docs so
    # token-less docs fall out as prior-only rows — no second
    # tokenize, no distinct/anti-join (round-14 review finding)
    toks = _tokens(docs, id_col, text_col)
    sums = (
        toks.join(weights, "term", "left")
        .crossJoin(F.broadcast(consts.select("oov_q30")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("w_q30"), F.col("oov_q30")))
             .cast("long").alias("_wsum"),
        )
    )
    return (
        docs.select(id_col)
        .join(sums, id_col, "left")
        .crossJoin(F.broadcast(consts.select("prior_q30")))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0))
             .cast("long").alias("n_tokens"),
            (F.coalesce(F.col("_wsum"), F.lit(0))
             + F.col("prior_q30")).cast("long").alias("score_q30"),
        )
    )
