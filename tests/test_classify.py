"""Naive Bayes train/score laws over a hand-counted corpus: add-one
weights, the constant OOV term, the prior-only empty-doc law, and
NULL-label exclusion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pycasselastic_spark.operators.classify import nb_score, nb_train

Q30 = 1 << 30


def _w(c_pos, c_neg, m_pos, m_neg, v):
    return math.floor(
        (math.log((c_pos + 1.0) / (m_pos + v))
         - math.log((c_neg + 1.0) / (m_neg + v))) * Q30
    )


def test_nb_hand_counted(spark):
    rows = [
        (1, "good good", "en"),
        (2, "bad", "de"),
        (3, "good bad", "en"),
        (4, "", "de"),
        (5, "new", None),   # NULL label: excluded from training
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    weights, consts = nb_train(
        docs, "doc_id", "text", F.col("lang") == "en"
    )
    got_w = {r["term"]: r["w_q30"] for r in weights.collect()}
    kc = consts.collect()[0]
    # training corpus: docs 1-4; good: pos 3 / neg 0; bad: pos 1 / neg 1
    # masses m_pos=4 m_neg=1, vocab 2; d_pos=2 d_neg=2 -> prior ln(1)=0
    assert got_w == {
        "good": _w(3, 0, 4, 1, 2),
        "bad": _w(1, 1, 4, 1, 2),
    }
    assert kc["oov_q30"] == _w(0, 0, 4, 1, 2)
    assert kc["prior_q30"] == 0

    out = {r["doc_id"]: (r["n_tokens"], r["score_q30"])
           for r in nb_score(docs, "doc_id", "text", weights, consts)
           .collect()}
    assert out[1] == (2, 2 * got_w["good"])
    assert out[2] == (1, got_w["bad"])
    assert out[3] == (2, got_w["good"] + got_w["bad"])
    assert out[4] == (0, 0)                  # empty doc: prior only
    assert out[5] == (1, kc["oov_q30"])      # unseen term: OOV const
    # the weak label orders as the classifier should: the purely-'en'
    # doc outscores the purely-'de' doc (doc 3 is a 50/50 token mix —
    # its two opposite-sign Q30 floors net to -1, correctly between)
    assert out[1][1] > out[3][1] > out[2][1]
