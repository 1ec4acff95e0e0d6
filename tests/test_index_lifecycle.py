"""Round-9 index-lifecycle tests: exclusive generation claims,
racing-updater behavior, the auto-compaction policy, deferred
variants, depth-2 fuzzy dictionaries, and the lifecycle columns in
``index_health`` — the daemon-cadence contract (the reference daemon
commits every minute, ``SyncCassElastic.py:45-47``, so
many-generation state is the index's production shape)."""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import functions as F

from pycasselastic_spark.operators import search as SRCH


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _build(spark, tmp_path, rows, n_buckets=4, variant_depth=1):
    path = str(tmp_path / "idx")
    SRCH.build_postings_index(
        _corpus(spark, rows), "doc_id", "text", path,
        n_buckets=n_buckets, variant_depth=variant_depth,
    )
    return path


def test_claim_generation_is_exclusive_and_skips_taken_numbers(
    spark, tmp_path
):
    """The O_EXCL claim file (round-8 verdict item: the pyds.py
    _commit_manifest pattern applied to the index) — a pre-existing
    claim, committed or orphaned, can never be claimed again."""
    path = str(tmp_path / "idx")
    os.makedirs(path)
    assert SRCH._claim_generation(path, 1) == 1
    # same start: the taken number is skipped, not reused
    assert SRCH._claim_generation(path, 1) == 2
    # an orphaned claim (crashed updater) blocks its number forever
    open(os.path.join(path, "gen-00000004.claim"), "w").close()
    assert SRCH._claim_generation(path, 4) == 5


def test_update_skips_orphaned_claim_numbers(spark, tmp_path):
    """An update whose start number is already claimed (e.g. a crashed
    concurrent updater) claims the NEXT free generation and commits
    normally — data files can never collide with the orphan's."""
    path = _build(spark, tmp_path, [(i, f"alpha w{i % 3}") for i in range(8)])
    # orphan claim on the number the next update would want (next_gen=1)
    open(os.path.join(path, "gen-00000001.claim"), "w").close()
    SRCH.update_postings_index(
        _corpus(spark, [(50, "beta alpha")]), "text", path
    )
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)
    assert stats["committed_gens"] == [0, 2]
    idx = SRCH.load_postings_index(spark, path)
    assert SRCH.bm25_topk_indexed(idx, ["beta"], k=5).count() == 1


def test_racing_updates_serialize_or_fail_cleanly(spark, tmp_path):
    """Two concurrent updaters on one index path: each claims a
    DISTINCT generation; either both commit (serialized) or the loser
    raises the concurrent-update error — and in every interleaving the
    index stays consistent (probes only see committed generations)."""
    base = [(i, f"alpha w{i % 3}") for i in range(20)]
    path = _build(spark, tmp_path, base)
    deltas = [
        _corpus(spark, [(100, "beta beta alpha")]),
        _corpus(spark, [(200, "gamma alpha")]),
    ]
    errors: list[Exception] = []

    def run(d):
        try:
            SRCH.update_postings_index(d, "text", path)
        except Exception as e:  # clean failure: rows stay uncommitted
            errors.append(e)

    threads = [threading.Thread(target=run, args=(d,)) for d in deltas]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # the commit-conflict failure (if any) is the documented one; any
    # writer that failed left only uncommitted (invisible) rows either
    # way, which the consistency checks below prove
    for e in errors:
        if isinstance(e, RuntimeError):
            assert "concurrent update" in str(e)

    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)
    committed = stats["committed_gens"]
    # gen 0 plus one commit per SUCCESSFUL updater, all distinct
    assert committed[0] == 0 and len(set(committed)) == len(committed)
    assert len(committed) == 1 + (2 - len(errors))
    # distinct claims even for the failed one
    claims = [n for n in os.listdir(path) if n.endswith(".claim")]
    assert len(claims) == len(set(claims)) == 2

    # consistency: scalars match a fresh build over the committed docs
    idx = SRCH.load_postings_index(spark, path)
    expect_docs = 20 + (2 - len(errors))
    assert idx.n_docs == expect_docs
    # every committed doc probe-visible exactly once
    got = SRCH.bm25_topk_indexed(idx, ["alpha"], k=50)
    assert got.count() == expect_docs
    assert got.select("doc_id").distinct().count() == expect_docs


def test_auto_compaction_policy_triggers_and_preserves_answers(
    spark, tmp_path
):
    """``ingest_into_postings_index`` with a CompactionPolicy: after
    enough small ingests cross max_committed_gens, the index folds
    back to generation 0 — and probes still answer exactly like a
    fresh build over the current corpus."""
    policy = SRCH.CompactionPolicy(max_committed_gens=3,
                                   max_files_per_bucket=10_000)
    path = str(tmp_path / "idx")
    batches = [
        [(j, f"alpha w{j % 4} b{i}") for j in range(i * 5, i * 5 + 5)]
        for i in range(6)
    ]
    for rows in batches:
        SRCH.ingest_into_postings_index(
            _corpus(spark, rows), "doc_id", "text", path,
            n_buckets=4, policy=policy,
        )
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)
    # 6 ingests with threshold 3: compaction MUST have fired (and the
    # committed set can never exceed threshold+1 right after an ingest)
    assert len(stats["committed_gens"]) <= policy.max_committed_gens + 1
    assert stats["committed_gens"][0] == 0

    current = {i: t for rows in batches for i, t in rows}
    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(
        _corpus(spark, sorted(current.items())), "doc_id", "text",
        fresh_path, n_buckets=4,
    )
    idx = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx.n_docs, idx.total_dl) == (fresh.n_docs, fresh.total_dl)
    for terms in (["alpha"], ["b0", "b5"], ["w3"]):
        got = sorted(map(tuple, SRCH.bm25_topk_indexed(idx, terms, k=40).collect()))
        want = sorted(map(tuple, SRCH.bm25_topk_indexed(fresh, terms, k=40).collect()))
        assert got == want, terms


def test_file_pressure_policy_triggers_on_files_per_bucket(
    spark, tmp_path
):
    """The files-per-bucket arm of the policy: with 1 bucket every
    ingest adds exactly one postings file, so the threshold fires
    after it is crossed and compaction resets the count to 1."""
    policy = SRCH.CompactionPolicy(max_committed_gens=10_000,
                                   max_files_per_bucket=3)
    path = str(tmp_path / "idx")
    for i in range(5):
        SRCH.ingest_into_postings_index(
            _corpus(spark, [(i, f"alpha b{i}")]), "doc_id", "text", path,
            n_buckets=1, policy=policy,
        )
        n = SRCH._max_files_per_bucket(os.path.join(path, "postings"))
        assert n <= policy.max_files_per_bucket + 1
    # and an ingest never writes more than ONE file per bucket per
    # relation (the repartition-on-bucket coalesce contract)
    before = SRCH._max_files_per_bucket(os.path.join(path, "postings"))
    SRCH.update_postings_index(_corpus(spark, [(99, "omega")]), "text", path)
    after = SRCH._max_files_per_bucket(os.path.join(path, "postings"))
    assert after <= before + 1


def test_deferred_variants_lag_until_compaction_but_exact_never_lags(
    spark, tmp_path
):
    """``defer_variants=True`` (the daemon small-file knob): a term
    first seen in a deferred ingest is not fuzzy-discoverable until
    compaction rebuilds the dictionary — but querying the EXACT term
    still works (raw query terms always ride the probe), and
    compaction restores full fuzzy recall."""
    path = _build(spark, tmp_path, [(1, "spark merge"), (2, "spark scan")])
    SRCH.update_postings_index(
        _corpus(spark, [(3, "zephyr spark")]), "text", path,
        defer_variants=True,
    )
    idx = SRCH.load_postings_index(spark, path)
    # fuzzy probe for the typo'd NEW term: dictionary lags -> no match
    assert SRCH.expand_fuzzy_terms(idx, ["zephyrs"]) == []
    # exact query for the new term: never lags
    assert SRCH.bm25_topk_fuzzy(idx, ["zephyr"], k=5).count() == 1
    # old terms' fuzzy recall untouched
    assert SRCH.expand_fuzzy_terms(idx, ["mergee"]) == ["merge"]

    SRCH.compact_postings_index(spark, path)
    idx2 = SRCH.load_postings_index(spark, path)
    assert SRCH.expand_fuzzy_terms(idx2, ["zephyrs"]) == ["zephyr"]


def test_fuzzy_depth2_matches_two_edit_terms(spark, tmp_path):
    """variant_depth=2 (ES fuzziness ceiling): two-edit typos match;
    the depth is stored in stats.json; a depth-1 index refuses
    max_dist=2 loudly; depth-2 serves max_dist=1 probes unchanged."""
    rows = [(1, "spark merge window"), (2, "shuffle spark"), (3, "scan merge")]
    path = _build(spark, tmp_path, rows, variant_depth=2)
    idx = SRCH.load_postings_index(spark, path)
    assert idx.variant_depth == 2
    # 'spakr' is 2 edits from 'spark' (transposition = del+ins)
    assert SRCH.expand_fuzzy_terms(idx, ["spakr"], max_dist=2) == ["spark"]
    # depth-2 dict still answers d<=1 probes with exact-d<=1 recall
    assert SRCH.expand_fuzzy_terms(idx, ["mergee"], max_dist=1) == ["merge"]
    # d=2 ranked probe end-to-end
    hits = SRCH.bm25_topk_fuzzy(idx, ["spakr"], k=5, max_dist=2)
    assert hits.count() == 2  # docs 1 and 2 contain 'spark'

    # maintenance keeps the depth: new terms fuzzy-match at d=2 too
    SRCH.update_postings_index(
        _corpus(spark, [(9, "catalog spark")]), "text", path
    )
    idx2 = SRCH.load_postings_index(spark, path)
    assert SRCH.expand_fuzzy_terms(idx2, ["catalogue"], max_dist=2) == ["catalog"]

    # a depth-1 index refuses d=2 instead of silently under-recalling
    d1_path = str(tmp_path / "d1")
    SRCH.build_postings_index(
        _corpus(spark, rows), "doc_id", "text", d1_path, n_buckets=4
    )
    d1 = SRCH.load_postings_index(spark, d1_path)
    import pytest
    with pytest.raises(ValueError, match="variant_depth"):
        SRCH.expand_fuzzy_terms(d1, ["spakr"], max_dist=2)


def test_index_health_lifecycle_columns(spark, tmp_path):
    """include_lifecycle=True surfaces the compaction-pressure inputs
    (files per bucket partition, committed generation count) the
    round-8 verdict asked for — and they move the way the lifecycle
    moves: up with every ingest, back to one generation after
    compaction."""
    path = _build(spark, tmp_path, [(i, f"alpha w{i % 5}") for i in range(15)])
    for j in range(2):
        SRCH.update_postings_index(
            _corpus(spark, [(100 + j, f"beta w{j}")]), "text", path
        )
    idx = SRCH.load_postings_index(spark, path)
    rows = SRCH.index_health(idx, include_lifecycle=True).collect()
    assert rows and {"n_files", "n_gens"} <= set(rows[0].asDict())
    assert all(r["n_gens"] == 3 for r in rows)
    assert all(1 <= r["n_files"] <= 3 for r in rows)
    # plain health (the oracle-checked shape) is unchanged
    plain = SRCH.index_health(idx).columns
    assert "n_files" not in plain and "n_gens" not in plain

    SRCH.compact_postings_index(spark, path)
    idx2 = SRCH.load_postings_index(spark, path)
    rows2 = SRCH.index_health(idx2, include_lifecycle=True).collect()
    assert all(r["n_gens"] == 1 and r["n_files"] == 1 for r in rows2)


def test_delete_by_query_fresh_build_parity_and_resurrection(
    spark, tmp_path
):
    """_delete_by_query must (1) rank every later probe exactly like a
    fresh build on the remaining corpus (scalars decremented, df
    shrunk), (2) report the deleted count, (3) leave a re-ingested id
    ALIVE again (the LWW resurrection ES has), and (4) no-op at count
    0 for a query matching nothing."""
    rows = [
        (1, "alpha beta old"),
        (2, "alpha gamma"),
        (3, "beta old stale"),
        (4, "gamma delta"),
    ]
    path = _build(spark, tmp_path, rows)
    n = SRCH.delete_by_query(spark, path, {
        "query": {"match": {"text": "old"}},
    })
    assert n == 2  # docs 1 and 3
    idx = SRCH.load_postings_index(spark, path)
    got = {
        r["doc_id"]: r["score_q20"]
        for r in SRCH.bm25_topk_indexed(idx, ["alpha", "gamma"],
                                        k=10).collect()
    }
    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(
        _corpus(spark, [rows[1], rows[3]]), "doc_id", "text", fresh_path,
        n_buckets=4,
    )
    fresh = SRCH.load_postings_index(spark, fresh_path)
    want = {
        r["doc_id"]: r["score_q20"]
        for r in SRCH.bm25_topk_indexed(fresh, ["alpha", "gamma"],
                                        k=10).collect()
    }
    assert got == want and set(got) == {2, 4}
    # nothing-matches delete is a zero-count no-op
    assert SRCH.delete_by_query(spark, path, {
        "query": {"term": {"text": "nonexistenttoken"}},
    }) == 0
    # resurrection: re-ingesting doc 1 brings it back
    SRCH.update_postings_index(
        _corpus(spark, [(1, "alpha reborn")]), "text", path
    )
    idx2 = SRCH.load_postings_index(spark, path)
    alive = {r["doc_id"] for r in SRCH.bm25_topk_indexed(
        idx2, ["alpha"], k=10).collect()}
    assert 1 in alive
    # deleted content never resurfaces: 'old' matches nothing
    assert SRCH.bm25_topk_indexed(idx2, ["old"], k=10).count() == 0


def test_delete_crash_before_commit_is_invisible_and_retryable(
    spark, tmp_path, monkeypatch
):
    """A delete that dies AFTER appending superseded rows but BEFORE
    the stats commit must change NOTHING (the orphan generation's
    superseded rows are invisible — readers filter by committed
    by_gen), and the retried delete must converge to fresh-build
    parity."""
    import pytest as _p

    from pycasselastic_spark.operators import search_index as SRCH_INDEX

    rows = [(1, "alpha old"), (2, "alpha keep"), (3, "beta old")]
    path = _build(spark, tmp_path, rows)
    idx0 = SRCH.load_postings_index(spark, path)
    before = sorted(map(tuple, SRCH.bm25_topk_indexed(
        idx0, ["alpha", "beta"], k=10).collect()))

    real_write = SRCH_INDEX._write_stats
    calls = {"n": 0}

    def exploding_write(p, stats):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash before delete commit")
        return real_write(p, stats)

    monkeypatch.setattr(SRCH_INDEX, "_write_stats", exploding_write)
    with _p.raises(OSError, match="injected crash"):
        SRCH.delete_by_query(spark, path, {
            "query": {"match": {"text": "old"}},
        })
    monkeypatch.setattr(SRCH_INDEX, "_write_stats", real_write)

    # nothing deleted: answers and scalars unchanged
    idx1 = SRCH.load_postings_index(spark, path)
    assert (idx1.n_docs, idx1.total_dl) == (idx0.n_docs, idx0.total_dl)
    assert sorted(map(tuple, SRCH.bm25_topk_indexed(
        idx1, ["alpha", "beta"], k=10).collect())) == before

    # retry converges to fresh-build parity on the survivors
    n = SRCH.delete_by_query(spark, path, {
        "query": {"match": {"text": "old"}},
    })
    assert n == 2
    fresh_path = str(tmp_path / "fresh")
    SRCH.build_postings_index(
        _corpus(spark, [rows[1]]), "doc_id", "text", fresh_path,
        n_buckets=4,
    )
    idx2 = SRCH.load_postings_index(spark, path)
    fresh = SRCH.load_postings_index(spark, fresh_path)
    assert (idx2.n_docs, idx2.total_dl) == (fresh.n_docs, fresh.total_dl)
    assert SRCH.bm25_topk_indexed(idx2, ["alpha"], k=10).collect() == \
        SRCH.bm25_topk_indexed(fresh, ["alpha"], k=10).collect()


def test_update_by_query_rewrites_docvalues_only(spark, tmp_path):
    """_update_by_query must (1) rewrite the scripted field on exactly
    the matched docs, (2) leave every probe ranking byte-identically
    (no analyzed content changed), (3) converge under replay (LWW
    absorbs the superseded twin), and (4) raise by name on
    unsupported Painless / unknown params / non-stored fields."""
    docs = spark.createDataFrame([
        (1, "alpha beta", 10, "keep"),
        (2, "alpha gamma", 20, "keep"),
        (3, "gamma delta", 30, "keep"),
    ], "doc_id long, text string, prio long, tag string")
    path = str(tmp_path / "upd")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["prio", "tag"],
    )
    before = SRCH.bm25_topk_indexed(
        SRCH.load_postings_index(spark, path), ["alpha", "gamma"], k=10
    ).collect()
    n = SRCH.update_by_query(spark, path, {
        "query": {"match": {"text": "alpha"}},
        "script": {"source": "ctx._source.prio += params.bump",
                   "params": {"bump": 5}},
    })
    assert n == 2
    idx = SRCH.load_postings_index(spark, path)
    dv = {r["doc_id"]: r["prio"]
          for r in idx.live_docvalues().select("doc_id", "prio").collect()}
    assert dv == {1: 15, 2: 25, 3: 30}
    # exactly one live version per doc; ranking unchanged
    assert idx.live_docvalues().count() == 3
    after = SRCH.bm25_topk_indexed(idx, ["alpha", "gamma"], k=10).collect()
    assert after == before
    # set-form + replay convergence
    for _ in range(2):
        SRCH.update_by_query(spark, path, {
            "query": {"term": {"text": "delta"}},
            "script": {"source": "ctx._source.tag = params.t",
                       "params": {"t": "hot"}},
        })
    idx2 = SRCH.load_postings_index(spark, path)
    tags = {r["doc_id"]: r["tag"]
            for r in idx2.live_docvalues().select("doc_id", "tag").collect()}
    assert tags == {1: "keep", 2: "keep", 3: "hot"}
    assert idx2.live_docvalues().count() == 3
    import pytest as _p
    with _p.raises(ValueError, match="unsupported update_by_query"):
        SRCH.update_by_query(spark, path, {
            "query": {"match": {"text": "alpha"}},
            "script": {"source": "ctx._source.prio *= 2"},
        })
    with _p.raises(ValueError, match="params carries"):
        SRCH.update_by_query(spark, path, {
            "query": {"match": {"text": "alpha"}},
            "script": {"source": "ctx._source.prio = params.v",
                       "params": {"w": 1}},
        })
    with _p.raises(ValueError, match="not a stored"):
        SRCH.update_by_query(spark, path, {
            "query": {"match": {"text": "alpha"}},
            "script": {"source": "ctx._source.nope = params.v",
                       "params": {"v": 1}},
        })
