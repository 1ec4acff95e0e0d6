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


texts = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dog", "x1", "zz"]),
        min_size=0, max_size=12,
    ).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=12,
)


@given(docs=texts)
@SETTINGS
def test_shingles_match_python_reference(spark, docs):
    """dedup.shingles == the plain-Python distinct n-gram builder for
    ANY token sequence (incl. < n tokens and repeated shingles) — the
    let-bound rewrite must not have changed semantics anywhere."""
    from pycasselastic_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select("doc_id", D.shingles("text", 3).alias("sh")).collect()
    }

    def ref(t):
        ws = t.split(" ")
        if len(ws) < 3:
            return []
        seen, out = set(), []
        for i in range(len(ws) - 2):
            g = " ".join(ws[i : i + 3])
            if g not in seen:
                seen.add(g)
                out.append(g)
        return sorted(out)

    want = {i: ref(t) for i, t in enumerate(docs)}
    assert got == want


@given(docs=texts)
@SETTINGS
def test_simhash_matches_python_reference(spark, docs):
    """The let-bound simhash fingerprint equals a plain-Python replay of
    the same md5 arithmetic (tf-weighted votes, floor/mod bit ops)."""
    import hashlib

    from pycasselastic_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["_id"]: (r["fp_hi"], r["fp_lo"])
        for r in simhash_fingerprints(df, "doc_id", "text").collect()
    }

    def half(tokens, off):
        counts = [0] * 32
        for w in tokens:
            h = int(hashlib.md5(w.encode()).hexdigest()[off - 1 : off + 7], 16)
            for j in range(32):
                counts[j] += 1 if (h // (2**j)) % 2 == 1 else -1
        return sum(2**j for j in range(32) if counts[j] >= 0)

    for i, t in enumerate(docs):
        toks = t.split(" ")  # "" splits to [""] — matches Spark's split
        assert got[i] == (half(toks, 1), half(toks, 9)), (i, t)


@given(data=rows, cuts=st.lists(st.integers(min_value=0, max_value=20),
                                min_size=1, max_size=4, unique=True))
@SETTINGS
def test_lww_snapshots_match_filtered_merges(spark, data, cuts):
    """Multi-as-of law: for EVERY cutoff v, the snapshot at v equals
    the LWW merge of increments with version <= v — the single-shuffle
    conditional-aggregate plan must be indistinguishable from the
    k-filtered-merges naive plan on any increment set."""
    from pycasselastic_spark.core.merge import lww_snapshots

    df = to_df(spark, data)
    snaps = lww_snapshots([df], "id", "version", cuts, tiebreak_cols=["payload"])
    got = {
        (r["snapshot_version"], r["id"], r["version"], r["payload"])
        for r in snaps.collect()
    }
    want = set()
    for v in cuts:
        sub = [t for t in data if t[1] <= v]
        for (i, ver, p) in golden_argmax(sub):
            want.add((v, i, ver, p))
    assert got == want


@given(docs=st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12),
    min_size=2, max_size=8,
))
@SETTINGS
def test_containment_matches_python_reference(spark, docs):
    """containment_pairs == the brute-force per-pair definition
    C(A->B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| for any
    corpus (threshold 0 disables pruning, so every sharing pair must
    surface with the exact ratio)."""
    from pycasselastic_spark.operators.dedup import containment_pairs

    texts = [" ".join(ws) for ws in docs]

    def sh(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i == j or not sh(a):
                continue
            shared = len(sh(a) & sh(b))
            if shared > 0:
                want[(i, j)] = (shared, len(sh(a)))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_inner"], r["doc_outer"]): (r["shared"], r["n_inner"])
        for r in containment_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    assert got == want


# --- span-level dedup laws ---------------------------------------------------

corpora = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=3),  # tiny vocab -> collisions
        min_size=0, max_size=14,
    ),
    min_size=2, max_size=5,
)


def golden_span_coverage(texts, w):
    """Brute-force duplicated-window coverage: per doc, the set of
    positions covered by any w-window whose exact text occurs in >= 2
    distinct docs."""
    from collections import defaultdict

    occ = defaultdict(set)
    for did, toks in enumerate(texts):
        for s in range(len(toks) - w + 1):
            occ[tuple(toks[s:s + w])].add(did)
    covered = {}
    nwin = {}
    for did, toks in enumerate(texts):
        pos = set()
        n = 0
        for s in range(len(toks) - w + 1):
            if len(occ[tuple(toks[s:s + w])]) >= 2:
                n += 1
                pos.update(range(s, s + w))
        if n:
            covered[did] = len(pos)
            nwin[did] = n
    return covered, nwin


@given(data=corpora, w=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_span_coverage_equals_bruteforce_union(spark, data, w):
    """duplicate_span_coverage's running-max interval union must equal
    the brute-force position-set size for ANY corpus and window width,
    and span_dedup_rewrite's removal count must match it (the
    detect/apply twins agree by construction, not by fixture)."""
    from pycasselastic_spark.operators.dedup import (
        duplicate_span_coverage,
        span_dedup_rewrite,
    )

    texts = [[f"t{v}" for v in doc] for doc in data]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    want_cov, want_nwin = golden_span_coverage(texts, w)
    got = {
        r["doc_id"]: r
        for r in duplicate_span_coverage(
            df, "doc_id", "text", window_tokens=w
        ).collect()
    }
    assert {d: r["covered_tokens"] for d, r in got.items()} == want_cov
    assert {d: r["n_dup_windows"] for d, r in got.items()} == want_nwin
    rw = {
        r["doc_id"]: r
        for r in span_dedup_rewrite(
            df, "doc_id", "text", window_tokens=w
        ).collect()
    }
    assert set(rw) == set(range(len(texts)))  # every doc passes through
    for did, r in rw.items():
        assert r["n_tokens"] - r["kept_tokens"] == want_cov.get(did, 0)


# --- temperature mixing laws -------------------------------------------------

strata_counts = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=5
)


@given(counts=strata_counts)
@SETTINGS
def test_temperature_alpha_zero_equalizes_rates(spark, counts):
    """alpha=0 gives every stratum the SAME target share (1/k), so the
    per-stratum keep rate is min(1, T/k/n_i) — balanced_sample's law
    with target T/k; and alpha=1 collapses to one global rate T/N.
    Checked via the actual kept sets (rates are not observable
    directly), with the md5 keep law replayed in Python."""
    import hashlib

    from pycasselastic_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = []
    next_id = 0
    for si, n in enumerate(counts):
        for _ in range(n):
            rows.append((next_id, f"s{si}"))
            next_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    T = 7

    def u(key):
        return int(
            hashlib.md5(str(key).encode()).hexdigest()[:13], 16
        ) / float(16 ** 13)

    # replay the engine's EXACT float op order (T * n^a / z / n) —
    # algebraically-equal spellings can differ in the last bit and
    # flip a keep decision
    k = len(counts)
    rate0 = {
        f"s{i}": min(1.0, float(T) * 1.0 / float(k) / float(n))
        for i, n in enumerate(counts)
    }
    got0 = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            df, "doc_id", "source", alpha=0.0, target_total=T
        ).collect()
    }
    assert got0 == {i for i, s in rows if u(i) < rate0[s]}
    N = float(sum(counts))
    rate1 = {
        f"s{i}": min(1.0, float(T) * float(n) / N / float(n))
        for i, n in enumerate(counts)
    }
    got1 = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            df, "doc_id", "source", alpha=1.0, target_total=T
        ).collect()
    }
    assert got1 == {i for i, s in rows if u(i) < rate1[s]}
