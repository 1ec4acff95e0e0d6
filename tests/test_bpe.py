"""BPE merge induction vs an independent pure-Python Sennrich
reference: merge table equality (counts, tie-breaks) and encode
equivalence, plus the exhaustion guard."""

from __future__ import annotations

import collections

import pytest

from pycasselastic_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)


def _ref_bpe(texts, k):
    """Dict-based Sennrich loop — deliberately a DIFFERENT
    construction (tuple symbol lists, no string replace)."""
    vocab = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    words = {w: tuple(w) for w in vocab}
    merges = []
    for rank in range(k):
        pairs = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            return merges
        # (count desc, left asc, right asc) — the engine's tiebreak
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def _ref_encode(word, merges):
    syms = list(word)
    for _rank, a, b, m, _cnt in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


TEXTS = [
    "low lower lowest slow slower",
    "new newer newest low low",
    "widest wide wider new",
    # repeated-pair words: a single-space encoding's replace skips
    # every second occurrence (round-14 review finding) — banana
    # must merge BOTH 'an's, aaaa must become [aa, aa]
    "banana bananas aaaa aaa banana",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(docs, "text", 8)
    assert got == _ref_bpe(TEXTS, 8)


def test_bpe_segment_matches_reference_encode(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", 6)
    seg = bpe_segment(docs, "doc_id", "text", merges).collect()
    words = {
        (r["doc_id"], r["word_pos"]): r["tokens"] for r in seg
    }
    for i, t in enumerate(TEXTS):
        for pos, w in enumerate(x for x in t.split(" ") if x):
            assert words[(i, pos)] == _ref_encode(w, merges), (w,)


def test_bpe_exhaustion_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # single-char words have no adjacent pairs at all
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(docs, "text", 1)


def test_bpe_k_validation(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k_merges"):
        bpe_train(docs, "text", 0)


def test_bpe_property_random_corpora(spark):
    # random short-alphabet corpora maximize repeated/overlapping
    # pair density — the class the curated TEXTS can undersample
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=5).map(" ".join),
        min_size=1, max_size=3,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[
                  HealthCheck.function_scoped_fixture])
    @given(texts=corpus)
    def check(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        ref = _ref_bpe(texts, 4)
        if len(ref) < 4:
            with pytest.raises(ValueError, match="exhausted"):
                bpe_train(docs, "text", 4)
            if not ref:
                return
            got = bpe_train(docs, "text", len(ref))
        else:
            got = bpe_train(docs, "text", 4)
        assert got == ref

    check()
