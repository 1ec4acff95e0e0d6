"""Property-based tests (hypothesis) for the engine's core algebraic
laws: the LWW merge is an idempotent, commutative, associative argmax;
the reference's convergence contract (SURVEY.md §2.3) must hold for
ANY increment set, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pycasselastic_spark.core.merge import lww_merge
from pycasselastic_spark.core.scd2 import scd2_apply

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # id
        st.integers(min_value=0, max_value=20),   # version
        st.integers(min_value=0, max_value=10**6),  # payload/tiebreak
    ),
    min_size=1,
    max_size=30,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def golden_argmax(data):
    best = {}
    for i, v, p in data:
        if i not in best or (v, p) > (best[i][1], best[i][2]):
            best[i] = (i, v, p)
    return set(best.values())


def to_df(spark, data):
    return spark.createDataFrame(data, "id long, version long, payload long")


@given(data=rows)
@SETTINGS
def test_merge_matches_golden_argmax(spark, data):
    got = {
        (r["id"], r["version"], r["payload"])
        for r in lww_merge([to_df(spark, data)], "id", "version", ["payload"]).collect()
    }
    assert got == golden_argmax(data)


@given(a=rows, b=rows)
@SETTINGS
def test_merge_commutative_and_split_invariant(spark, a, b):
    """merge(A, B) == merge(B, A) == merge(A ∪ B): the result depends
    only on the union of increments, never on delivery grouping/order —
    this is what makes micro-batch replay safe."""
    da, db = to_df(spark, a), to_df(spark, b)
    ab = {tuple(r) for r in lww_merge([da, db], "id", "version", ["payload"]).collect()}
    ba = {tuple(r) for r in lww_merge([db, da], "id", "version", ["payload"]).collect()}
    un = {
        tuple(r)
        for r in lww_merge([to_df(spark, a + b)], "id", "version", ["payload"]).collect()
    }
    assert ab == ba == un == golden_argmax(a + b)


@given(data=rows)
@SETTINGS
def test_merge_idempotent(spark, data):
    df = to_df(spark, data)
    once = lww_merge([df], "id", "version", ["payload"])
    twice = lww_merge([once, df], "id", "version", ["payload"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


@given(data=rows)
@SETTINGS
def test_scd2_refold_idempotent(spark, data):
    """Applying the same update batch twice never changes the history."""
    from pyspark.sql import functions as F

    history = (
        to_df(spark, [(i, 0, 0) for i in {d[0] for d in data}])
        .select(
            "id",
            F.col("payload").cast("string").alias("attr"),
            F.lit(0).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    updates = to_df(spark, data).select(
        "id", F.col("version"), F.col("payload").cast("string").alias("attr"), "payload"
    )
    h1 = scd2_apply(history, updates, "id", "version", ["attr"], ["payload"])
    h2 = scd2_apply(h1, updates, "id", "version", ["attr"], ["payload"])
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))


def test_pii_patterns_redact_and_count(spark):
    """The PII regexes must actually fire: synthetic rows with emails,
    SSNs, and phone numbers come back redacted with correct counts
    (the corpus itself is PII-free, so the oracle check alone would
    pass vacuously)."""
    from pyspark.sql import functions as F

    from pycasselastic_spark.catalog import _PII_EMAIL, _PII_PHONE, _PII_SSN

    rows = [
        (1, "reach me at jane.doe+spam@example.co.uk or 555-123-4567 ok"),
        (2, "ssn 123-45-6789 appears once"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]"),
            _PII_SSN, "[SSN]",
        ),
        _PII_PHONE, "[PHONE]",
    )
    got = {r["doc_id"]: r["r"] for r in df.select("doc_id", red.alias("r")).collect()}
    assert got[1] == "reach me at [EMAIL] or [PHONE] ok"
    assert got[2] == "ssn [SSN] appears once"
    assert got[3] == "no pii here at all"
