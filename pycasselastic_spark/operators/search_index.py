"""Persisted postings index: lifecycle (build / delta-ingest /
compact / snapshot / alias), crash-atomic generation commits, and the
self-managing compaction policy.

Split out of ``operators/search.py`` (round 10); the public surface is
re-exported there — import from ``pycasselastic_spark.operators.search``.
See that module's docstring for the scale rationale and the reference
citations (``pyCassElastic.py:316-354`` — the reference keeps ES's index
fresh every sync cycle; this module is that contract over stored
parquet).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pycasselastic_spark.plans.tuning import run_actions_concurrently

Q20 = float(1 << 20)


def _tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


# ---------------------------------------------------------------------------
# Analyzer chain (round-10 verdict item 1). The reference delegated all
# text analysis to Elasticsearch's analyzers ("trusting that es will
# correctly get types", pyCassElastic.py:334); an ES-capability-parity
# engine needs its own: a configurable lowercase -> punctuation-strip ->
# stopword chain, persisted as an INDEX SETTING (stats.json, like
# ``variant_depth``) and applied identically at ingest and query time.
# Dropped tokens (stopwords, punctuation-only) keep their position SLOT
# (Lucene's position-gap behavior), so phrase/slop semantics over the
# surviving terms are unchanged; doc length counts only KEPT tokens
# (Lucene's field norm). ``analyzer=None`` is the legacy exact-token
# index — bare split-on-space — so existing indexes keep working and
# upgrading one is a settings-change reindex
# (``reindex_postings_index(analyzer=...)``).
# ---------------------------------------------------------------------------

_PUNCT_RE = "[^a-zA-Z0-9]"


@dataclass(frozen=True)
class Analyzer:
    """An ES-style analysis chain: optional lowercase, optional
    punctuation strip (every char outside [a-zA-Z0-9]), optional
    stopword drop, optional synonym fold, optional suffix-stripping
    stem — applied per token of the tokenizer split, in that fixed
    order (ES's standard tokenizer + lowercase + stop + synonym +
    stemmer filter shape; the reference delegates all of this to ES's
    index analyzers, ``pyCassElastic.py:329,334``). Frozen: an
    analyzer is an index SETTING; changing it is a reindex, not a
    mutation.

    ``synonyms`` is an ordered sequence of single-token (src, dst)
    rewrites applied at BOTH index and query time (ES synonym filter
    in its index-time form): a token equal to ``src`` becomes ``dst``,
    so variants fold into one stored term (tf sums, position slots
    union — exactly what a multi-token ingest of the same term does).
    Rules apply sequentially in the given order, so a later rule sees
    earlier rewrites (a->b, b->c cascades a to c) — the order is part
    of the setting and is persisted as given, never sorted.

    ``stem=True`` appends the S-stemmer (Harman's suffix-stripper —
    the shape of ES's ``minimal_english`` stemmer): for tokens of
    length >= 4, ``-ies`` becomes ``-y`` (unless ``-eies``/``-aies``),
    else a trailing ``-es`` drops its ``s`` (unless ``-aes``/``-ees``/
    ``-oes``), else a trailing ``-s`` drops (unless ``-us``/``-ss``).
    Deterministic string ops only — both engines and the Python twin
    compute it byte-identically."""

    lowercase: bool = True
    strip_punct: bool = True
    stopwords: tuple[str, ...] = ()
    # The tokenizer pattern (a regex, as Spark's split and Python's
    # re.split both treat it). The default single space matches the
    # legacy corpus-scan operators; real corpora want r"\s+" — the
    # choice is an index setting like everything else here, and the
    # Python twin is pinned byte-identical to the Spark side in tests.
    split_regex: str = " "
    synonyms: tuple[tuple[str, str], ...] = ()
    stem: bool = False

    def __post_init__(self) -> None:
        for pair in self.synonyms:
            src, dst = pair
            if not src or not dst or " " in dst:
                raise ValueError(
                    "synonym rules must map a non-empty token (or "
                    "space-separated token PHRASE) to one non-empty "
                    f"token (expansion to multi-word targets is not "
                    f"implemented): {pair!r}"
                )
            if " " in src and any(not t for t in src.split(" ")):
                raise ValueError(
                    f"phrase synonym source has an empty token: {pair!r}"
                )
        if self.has_phrase_rules and not self.strip_punct:
            # the stream-level matcher delimits token slots with a
            # control character; strip_punct guarantees tokens are
            # [a-zA-Z0-9]* so the delimiter can never collide
            raise ValueError(
                "multi-word synonyms require strip_punct=True (the "
                "phrase matcher needs a guaranteed token charset)"
            )

    @property
    def has_phrase_rules(self) -> bool:
        """True when any synonym source is a multi-token phrase — the
        chain then applies ALL synonym rules at the token-STREAM level
        (ES ``synonym_graph`` in its index-time contraction form)
        instead of per token, so rule order is honored across both
        kinds."""
        return any(" " in src for src, _dst in self.synonyms)

    def to_dict(self) -> dict:
        d = {
            "lowercase": self.lowercase,
            "strip_punct": self.strip_punct,
            "stopwords": sorted(self.stopwords),
            "split_regex": self.split_regex,
        }
        # only serialized when used, so round-10 stats.json files and
        # their oracles remain byte-stable
        if self.synonyms:
            d["synonyms"] = [list(p) for p in self.synonyms]  # ordered
        if self.stem:
            d["stem"] = True
        return d

    @staticmethod
    def from_dict(d: dict | None) -> "Analyzer | None":
        if d is None:
            return None
        return Analyzer(
            lowercase=bool(d["lowercase"]),
            strip_punct=bool(d["strip_punct"]),
            stopwords=tuple(d["stopwords"]),
            split_regex=d.get("split_regex", " "),
            synonyms=tuple(
                (p[0], p[1]) for p in d.get("synonyms", [])
            ),
            stem=bool(d.get("stem", False)),
        )

    def split_py(self, text: str) -> list[str]:
        """Python twin of the tokenizer split (query-side raw text ->
        token slots; the chain then runs per slot)."""
        import re

        return re.split(self.split_regex, text)

    def _stage1_col(self, tok: Column) -> Column:
        """Chain stages BEFORE the synonym filter (lowercase, punct
        strip, stopword drop) on one token column."""
        out = tok
        if self.lowercase:
            out = F.lower(out)
        if self.strip_punct:
            out = F.regexp_replace(out, _PUNCT_RE, "")
        if self.stopwords:
            out = F.when(
                out.isin(list(self.stopwords)), F.lit("")
            ).otherwise(out)
        return out

    def _apply_col(self, tok: Column) -> Column:
        """The chain on ONE token column; a dropped token becomes ''
        (callers filter empties but keep slots). Phrase analyzers
        cannot analyze per token — their synonym filter needs the
        whole stream (``analyze_tokens`` routes them)."""
        if self.has_phrase_rules:
            raise ValueError(
                "a phrase-synonym analyzer has no per-token form — "
                "use analyze_tokens / apply_tokens_py on the stream"
            )
        out = self._stage1_col(tok)
        for src, dst in self.synonyms:
            # sequential whens so a later rule sees earlier rewrites —
            # exactly what apply_py's sequential reassignment does
            out = F.when(out == F.lit(src), F.lit(dst)).otherwise(out)
        return self._stem_col(out)

    def _stem_col(self, out: Column) -> Column:
        """The stemmer stage alone (chain tail) on one token column."""
        if self.stem:
            # an exception TERMINATES its suffix class ('goes' hits
            # the -oes exception and stays 'goes' — it must not fall
            # through to the bare -s rule), so each class guards its
            # exceptions inside the branch
            n = F.length(out)
            out = (
                F.when(
                    out.endswith("ies"),
                    F.when(
                        (n >= 4)
                        & ~out.endswith("eies")
                        & ~out.endswith("aies"),
                        F.concat(
                            F.substring(out, F.lit(1), n - 3), F.lit("y")
                        ),
                    ).otherwise(out),
                )
                .when(
                    out.endswith("es"),
                    F.when(
                        (n >= 4)
                        & ~out.endswith("aes")
                        & ~out.endswith("ees")
                        & ~out.endswith("oes"),
                        F.substring(out, F.lit(1), n - 1),
                    ).otherwise(out),
                )
                .when(
                    out.endswith("s"),
                    F.when(
                        (n >= 4) & ~out.endswith("us") & ~out.endswith("ss"),
                        F.substring(out, F.lit(1), n - 1),
                    ).otherwise(out),
                )
                .otherwise(out)
            )
        return out

    def _stage1_py(self, token: str) -> str:
        import re

        out = token
        if self.lowercase:
            out = out.lower()
        if self.strip_punct:
            out = re.sub(_PUNCT_RE, "", out)
        if self.stopwords and out in self.stopwords:
            out = ""
        return out

    def _stem_py(self, out: str) -> str:
        if self.stem:
            if out.endswith("ies"):
                if len(out) >= 4 and not out.endswith(("eies", "aies")):
                    out = out[:-3] + "y"
            elif out.endswith("es"):
                if len(out) >= 4 and not out.endswith(
                    ("aes", "ees", "oes")
                ):
                    out = out[:-1]
            elif out.endswith("s"):
                if len(out) >= 4 and not out.endswith(("us", "ss")):
                    out = out[:-1]
        return out

    def normalize_base_py(self, token: str) -> str:
        """The CHARACTER pipeline only (lowercase + punct strip) — what
        Lucene's ``Analyzer.normalize`` runs on wildcard/fuzzy/prefix
        bases: multi-term query bases are normalized but never
        tokenized, stopped, synonym-rewritten, or stemmed (stemming a
        prefix would change what it prefixes). query_string routes its
        ``foo*`` / ``foo~N`` bases through here so ``Spark*`` under a
        lowercasing analyzer expands exactly like ``spark*``."""
        import re

        out = token
        if self.lowercase:
            out = out.lower()
        if self.strip_punct:
            out = re.sub(_PUNCT_RE, "", out)
        return out

    def apply_py(self, token: str) -> str:
        """Python twin of ``_apply_col`` — query-side analysis must be
        byte-identical to ingest-side (the one invariant every search
        engine lives or dies by)."""
        if self.has_phrase_rules:
            raise ValueError(
                "a phrase-synonym analyzer has no per-token form — "
                "use analyze_tokens / apply_tokens_py on the stream"
            )
        out = self._stage1_py(token)
        for src, dst in self.synonyms:
            if out == src:
                out = dst
        return self._stem_py(out)

    # -- stream-level synonym filter (multi-word rules) -----------------
    #
    # ES ``synonym_graph`` in its index-time CONTRACTION form: a rule
    # whose source is a token phrase ("new york" -> "nyc") rewrites the
    # contiguous slot run to the target in the FIRST slot with the
    # remaining slots emptied (position gaps — consistent with how
    # every dropped token already behaves; ES's contraction instead
    # shifts positions, a bookkeeping difference with identical
    # match/score semantics under slot-gap phrase matching). Rules
    # apply SEQUENTIALLY in the given order, leftmost-non-overlapping
    # per rule — single-token rules run through the same pass so
    # cross-kind rule order is honored. A stopword dropped INSIDE a
    # phrase leaves an empty slot and breaks adjacency, exactly as
    # position-aware synonym matching does in Lucene.
    #
    # Mechanics (identical bytes in Spark, Python, and the SQL
    # oracle): the stage-1 token array joins into one string with each
    # slot wrapped in \x01 delimiters (strip_punct guarantees \x01
    # cannot occur in a token), each rule is ONE literal
    # find-and-replace, and the string splits back into slots.

    _SEP = "\x01"

    def _phrase_pat(self, src: str) -> str:
        sep = self._SEP
        return sep + (sep + sep).join(src.split(" ")) + sep

    def _phrase_rep(self, src: str, dst: str) -> str:
        sep = self._SEP
        k = len(src.split(" "))
        return sep + dst + sep + (sep + sep) * (k - 1)

    def _syn_stream_col(self, arr: Column) -> Column:
        """ALL synonym rules applied at the stream level to a stage-1
        token array column; returns the rewritten array (slot count
        preserved)."""
        sep = self._SEP
        s = F.concat(
            F.lit(sep), F.array_join(arr, sep + sep), F.lit(sep)
        )
        for src, dst in self.synonyms:
            s = F.replace(
                s, F.lit(self._phrase_pat(src)),
                F.lit(self._phrase_rep(src, dst)),
            )
        inner = F.substring(s, F.lit(2), F.length(s) - 2)
        return F.split(inner, sep + sep, -1)

    def apply_tokens_py(self, tokens: list[str]) -> list[str]:
        """Python twin of the full chain on a token STREAM (slot list
        in, slot list out, '' = dropped slot) — required for phrase
        analyzers, byte-identical to the per-token path otherwise."""
        toks = [self._stage1_py(t) for t in tokens]
        if self.has_phrase_rules:
            sep = self._SEP
            s = sep + (sep + sep).join(toks) + sep
            for src, dst in self.synonyms:
                s = s.replace(
                    self._phrase_pat(src), self._phrase_rep(src, dst)
                )
            toks = s[1:-1].split(sep + sep)
        else:
            for i, t in enumerate(toks):
                for src, dst in self.synonyms:
                    if t == src:
                        t = dst
                toks[i] = t
        return [self._stem_py(t) for t in toks]


def analyze_tokens(
    text_col: Column | str, analyzer: Analyzer | None
) -> Column:
    """The analyzed token array of a text column: split on single
    space, each slot passed through the chain, dropped tokens left as
    '' IN PLACE (position slots survive — Lucene position gaps).
    ``analyzer=None`` = the legacy bare split."""
    if analyzer is None:
        return _tokens(text_col)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, analyzer.split_regex)
    if analyzer.has_phrase_rules:
        # phrase analyzers: stage-1 per slot, then the stream-level
        # synonym pass, then the stemmer per slot — the per-token
        # composition below is byte-identical when no phrase rule
        # exists, so legacy indexes keep their exact expression
        staged = F.transform(toks, analyzer._stage1_col)
        return F.transform(
            analyzer._syn_stream_col(staged), analyzer._stem_col
        )
    return F.transform(toks, analyzer._apply_col)


def analyzed_dl(text_col: Column | str, analyzer: Analyzer | None) -> Column:
    """Document length under the analyzer: KEPT tokens only (the
    Lucene field norm). Legacy (None) keeps the historical slot count
    (``size(split(...))``) so existing indexes and oracles are
    byte-stable."""
    if analyzer is None:
        return F.size(_tokens(text_col))
    return F.size(
        F.filter(analyze_tokens(text_col, analyzer), lambda x: x != "")
    )


def analyze_terms_py(
    terms: list[str], analyzer: Analyzer | None
) -> list[str]:
    """Query-side analysis: each raw query term through the chain,
    dropped terms removed, order preserved, duplicates kept (BM25
    probes dedupe where their semantics require it)."""
    if analyzer is None:
        return list(terms)
    # the term list IS the token stream in order, so phrase rules see
    # adjacent query terms ("new", "york" contracts exactly as it did
    # at ingest); the stream pass is byte-identical per-token otherwise
    out = analyzer.apply_tokens_py(list(terms))
    return [t for t in out if t != ""]


# ---------------------------------------------------------------------------
# Persisted, incrementally-maintained postings index
# ---------------------------------------------------------------------------
#
# The reference's entire purpose is keeping an ALWAYS-FRESH search index
# so queries are cheap at query time: every sync cycle bulk-upserts the
# increment into Elasticsearch (``pyCassElastic.py:316-354``), and ES
# maintains the inverted index incrementally. The corpus-scan operators
# above (``bm25_topk``/``tfidf_top_terms``) recompute ``term_postings``
# from the raw text on every call — correct and plan-clean, but their
# cost is corpus-linear PER QUERY; at 100 TB that is the difference
# between a search engine and a batch job. ``PostingsIndex`` closes the
# gap the same way the MinHash band index does for near-dup
# (``dedup.py:minhash_band_index`` / ``minhash_lsh_pairs_between``):
# store the expensive per-doc structure once, maintain it per ingest,
# and make the query-side plan probe the stored structure.
#
# Layout at ``path`` (all standard parquet — any engine can audit it):
#
# - ``postings/``  (term, id, tf, positions, dl, gen) partitioned by
#   ``pbucket = md5(term) % n_buckets``: a query for a handful of terms
#   prunes to a handful of partition directories (directory-level
#   partition pruning) and pushes ``term IN (...)`` into the parquet
#   scan. Token POSITIONS ride along per posting (sorted array) —
#   Lucene's proximity data — enabling phrase/slop matching without
#   touching raw text. ``dl`` (doc length) is denormalized into every
#   posting, Lucene-norms-style, so BM25 needs NO join to a doc table.
# - ``docstats/`` (id, dl, gen): one row per ingested doc version; the
#   authoritative doc list (drives incremental scalar maintenance).
# - ``superseded/`` (id, gen): (doc, generation) pairs REPLACED by a
#   later ingest of the same id. Queries drop them with one broadcast
#   anti-join — the LWW-loser retraction (reference O7) applied to
#   index entries. Normally tiny: only re-ingested docs ever appear.
# - ``stats.json`` {n_docs, total_dl, generation}: corpus scalars
#   maintained INCREMENTALLY (no corpus scan to answer N/avgdl);
#   single-writer per index, like the reference's lastruntime.log.
#
# Scale shape of a query probe: pruned parquet scan (few partitions,
# pushed term filter) -> broadcast anti-join (superseded, usually
# empty) -> per-term df aggregation over the pruned rows -> broadcast
# join back -> groupBy(id) -> TakeOrderedAndProject. Zero Generate
# nodes, zero corpus reads — work scales with the query's postings,
# not the corpus (pinned by tests/test_plans.py).


def _bounded_broadcast(
    df: DataFrame, threshold: int = 2_000_000
) -> DataFrame:
    """Broadcast-or-shuffle escape hatch for candidate/hit relations
    whose size is query-dependent: usually query-bounded-small (a few
    terms' postings -> broadcast, keeping the corpus side
    shuffle-free), but a stop-word-frequency query term can match a
    corpus-scale fraction, where a forced broadcast would OOM the
    driver/executors — fall back to a shuffle join there (ES's
    sampler-aggregation escape hatch, chosen automatically). The
    count() action re-runs the candidate aggregation once; probe
    correctness at any scale is worth one bounded pass (round-9
    advisor finding: every probe that broadcasts a scored candidate
    set needs this, not just facets/significant_terms). Lives here so
    BOTH probe modules (search_probes, search_ext) reach it without a
    circular import."""
    return df if df.count() > threshold else F.broadcast(df)


def hits_relation(index, query_terms) -> DataFrame:
    """The hit-id relation an aggregation scopes to: a TERM LIST runs
    the pruned postings probe (docs matching ANY term — the match
    query's hit set, the historical fast path); a DataFrame IS the hit
    set already (one ``id_col`` column — how aggs compose with
    non-match queries: term / range / terms / exists / bool hit sets
    are derived once by the dispatcher and every agg shares them).
    Lives here so both probe modules reach it without a circular
    import."""
    if isinstance(query_terms, DataFrame):
        return query_terms.select(index.id_col).distinct()
    return (
        index.live_postings_for(query_terms)
        .select(index.id_col)
        .distinct()
    )


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Python twin of ``_term_bucket_col`` — md5-based so both sides
    agree regardless of PYTHONHASHSEED (same rationale as
    ``sources.pyds._bucket_of``)."""
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


@dataclass
class PostingsIndex:
    """Handle to a stored index: lazy relations + driver-side scalars."""

    path: str
    postings: DataFrame    # term, id, tf, positions, dl, gen, pbucket
    superseded: DataFrame  # id, gen (may be empty)
    forward: DataFrame     # ibucket, id, term, tf, gen (doc -> terms)
    variants: DataFrame    # vbucket, variant, term, gen (FastSS dict)
    n_docs: int
    total_dl: int
    generation: int
    n_buckets: int
    id_col: str
    variant_depth: int = 1  # FastSS deletion depth of the stored dict
    analyzer: "Analyzer | None" = None  # None = legacy exact-token index
    docvalues: "DataFrame | None" = None  # (ibucket, id, <fields>, gen)
    stored_fields: tuple[str, ...] = ()
    nested_fields: tuple[str, ...] = ()  # array<struct> ES 'nested' types
    # the analyzed TEXT field's column name — recorded so field-naming
    # request bodies (significant_text, completion) can be validated
    # instead of silently serving the wrong field; None on indexes
    # built before round 14 (validation falls back to rejecting
    # stored-field collisions only)
    text_col: "str | None" = None

    @property
    def avgdl(self) -> float:
        return self.total_dl / self.n_docs if self.n_docs else 0.0

    def live_docvalues(self) -> DataFrame:
        """Current-generation DOC-VALUES rows — the columnar per-doc
        field store (ES doc_values) that makes filter-context queries
        (range/term filters) self-contained: no raw docs frame needed
        at query time. Predicates on the stored fields push into this
        parquet scan."""
        if self.docvalues is None:
            raise ValueError(
                "this index stores no doc values — rebuild with "
                "stored_fields=[...] to enable filter-context queries"
            )
        if self.generation == 0:
            return self.docvalues
        return self.docvalues.join(
            F.broadcast(self.superseded), [self.id_col, "gen"], "left_anti"
        )

    def analyze_terms(self, terms: list[str]) -> list[str]:
        """Raw query terms through THIS index's stored analyzer — the
        query side of the ingest/query analysis invariant. Probes take
        pre-analyzed terms (they must be driver literals for partition
        pruning); callers route user input through here first."""
        return analyze_terms_py(terms, self.analyzer)

    def analyze_text(self, text: str) -> list[str]:
        """Raw query TEXT through the stored tokenizer + chain — what
        an ES ``match`` query does to its input string. Falls back to
        the legacy single-space split on exact-token indexes."""
        if self.analyzer is None:
            return [t for t in text.split(" ") if t != ""]
        return analyze_terms_py(
            self.analyzer.split_py(text), self.analyzer
        )

    def live_postings_for(self, query_terms: list[str]) -> DataFrame:
        """Current-generation postings for ``query_terms`` only: the
        pruned probe every indexed query starts from. Partition
        pruning (pbucket IN ...) + pushed term filter reach the scan;
        superseded doc versions drop via one broadcast anti-join."""
        buckets = sorted({_term_bucket_py(t, self.n_buckets) for t in query_terms})
        pruned = self.postings.filter(
            F.col("pbucket").isin(buckets) & F.col("term").isin(query_terms)
        )
        if self.generation == 0:
            return pruned  # nothing was ever re-ingested
        return pruned.join(
            F.broadcast(self.superseded), [self.id_col, "gen"], "left_anti"
        )

    def live_postings(self) -> DataFrame:
        """ALL current-generation postings (committed + superseded
        dropped) — the corpus-statistics side of index analytics
        (significant-terms background counts). A full stored-relation
        scan by design: still postings-sized, never raw text."""
        if self.generation == 0:
            return self.postings
        return self.postings.join(
            F.broadcast(self.superseded), [self.id_col, "gen"], "left_anti"
        )

    def live_forward(self) -> DataFrame:
        """ALL current-generation forward rows (doc -> terms); the
        id-keyed twin of ``live_postings`` for hit-set joins whose id
        list is a DataFrame, not a driver-side literal."""
        if self.generation == 0:
            return self.forward
        return self.forward.join(
            F.broadcast(self.superseded), [self.id_col, "gen"], "left_anti"
        )

    def live_forward_for(self, doc_ids: list) -> DataFrame:
        """Current-generation FORWARD rows (doc -> its terms) for the
        given ids: the id-keyed twin of ``live_postings_for`` —
        partition pruning on the id bucket + pushed id filter, then the
        same superseded anti-join."""
        buckets = sorted({_term_bucket_py(str(i), self.n_buckets) for i in doc_ids})
        pruned = self.forward.filter(
            F.col("ibucket").isin(buckets) & F.col(self.id_col).isin(doc_ids)
        )
        if self.generation == 0:
            return pruned
        return pruned.join(
            F.broadcast(self.superseded), [self.id_col, "gen"], "left_anti"
        )


def _tokenized_base(
    docs: DataFrame, id_col: str, text_col: str,
    analyzer: Analyzer | None,
) -> DataFrame:
    """(id, dl, _toks) for one ingest — the analyzer chain run EXACTLY
    ONCE per document. Both the postings aggregation and the docstats
    relation derive from this frame, so an ingest that persists it
    tokenizes the batch once instead of once per consumer (the build
    path used to re-run the full analysis chain three times: postings,
    docstats write, corpus-scalar agg). ``dl`` is byte-identical to
    ``analyzed_dl``: raw slot count for the legacy bare split, kept
    (non-empty) token count under an analyzer."""
    toks = analyze_tokens(text_col, analyzer)
    if analyzer is None:
        dl = F.size(toks)
    else:
        dl = F.size(F.filter(toks, lambda x: x != ""))
    return docs.select(F.col(id_col), dl.alias("dl"), toks.alias("_toks"))


def _positional_postings_from_base(
    base: DataFrame, id_col: str, n_buckets: int, gen: int
) -> DataFrame:
    """(pbucket, term, id, tf, positions, dl, gen) for one ingest,
    from a ``_tokenized_base`` frame.

    One posexplode + ONE exchange for aggregation AND layout (guide
    §2.4 — two operations keyed the same way share one exchange):
    ``pbucket`` is a pure function of ``term``, so hash-partitioning by
    it already clusters every ``(term, id)`` group into one partition;
    grouping by ``(pbucket, term, id)`` then satisfies the aggregation's
    required distribution with no further shuffle, and the output is
    already partitioned exactly as the ``partitionBy("pbucket")``
    parquet write needs — the ingest used to pay a second full
    exchange of the aggregated postings just to re-key them by bucket
    (2 Exchange -> 1, identical rows pinned by exceptAll both ways).
    Positions are slot indices into the single-space split (dropped
    tokens — empty, punctuation-only, stopwords — keep their slot:
    Lucene position gaps)."""
    toks = (
        base.select(
            F.col(id_col),
            F.col("dl"),
            F.posexplode("_toks").alias("pos", "term"),
        )
        .filter(F.col("term") != "")
        .withColumn("pbucket", _term_bucket_col(F.col("term"), n_buckets))
    )
    return (
        toks.repartition("pbucket")
        .groupBy("pbucket", "term", id_col)
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.first("dl").alias("dl"),
        )
        .withColumn("gen", F.lit(gen).cast("long"))
        .select("term", id_col, "tf", "positions", "dl", "gen", "pbucket")
    )


def _positional_postings(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int, gen: int,
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(pbucket, term, id, tf, positions, dl, gen) for one ingest —
    the analyzer chain runs INSIDE the same projection, so an
    analyzed ingest is still one scan + one shuffle."""
    return _positional_postings_from_base(
        _tokenized_base(docs, id_col, text_col, analyzer),
        id_col, n_buckets, gen,
    )


# A term's FastSS deletion neighborhood at depth d (the term itself +
# every way of deleting up to d characters): ed(x, y) <= d only if
# their depth-d neighborhoods intersect (Bocek et al.'s FastSS bound),
# so an equi-join on variants generates every d<=depth candidate
# (verified with exact levenshtein afterwards — the same recall-exact
# blocking as operators/dedup.edit_distance_pairs). Depth 1 matches ES
# fuzziness=1; depth 2 reaches ES's fuzziness ceiling (AUTO caps at 2)
# at ~L^2/2 variants per term instead of L — the depth is a build-time
# choice stored in stats.json (``variant_depth``) so depth-1 indexes
# keep working unchanged.
_DEL1 = (
    "transform(sequence(1, length({v})), i -> "
    "concat(substring({v}, 1, i-1), "
    "substring({v}, i+1, length({v}))))"
)


def _deletion_variants_expr(depth: int) -> str:
    """SQL expression for the depth-``depth`` deletion neighborhood of
    ``term`` (array of distinct strings, the term included). Depth 2
    re-applies the single-deletion transform to every depth-1 variant,
    guarding zero-length intermediates (sequence(1, 0) would run
    backwards)."""
    d1 = _DEL1.format(v="term")
    if depth == 1:
        return f"array_distinct(concat(array(term), {d1}))"
    if depth == 2:
        d2 = (
            f"flatten(transform({d1}, v -> "
            "case when length(v) >= 1 then "
            + _DEL1.format(v="v")
            + " else array() end))"
        )
        return f"array_distinct(concat(array(term), {d1}, {d2}))"
    raise ValueError(f"variant_depth must be 1 or 2, got {depth}")


def _deletion_variants_py(term: str, depth: int = 1) -> list[str]:
    """Python twin of ``_deletion_variants_expr`` for query-side
    expansion."""
    frontier = {term}
    out = dict.fromkeys([term])
    for _ in range(depth):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        for v in sorted(nxt):
            out.setdefault(v)
        frontier = nxt
    return list(out)


def _write_index_relations(
    postings: DataFrame, id_col: str, n_buckets: int, path: str, mode: str,
    variant_depth: int = 1, write_variants: bool = True,
) -> None:
    """Write the term-keyed postings AND the id-keyed forward relation
    from one ingest's postings. The forward relation is the same rows
    re-partitioned by the DOC id's bucket — the probe path for
    id-keyed questions (more-like-this, doc term vectors) that would
    otherwise full-scan a term-partitioned layout. The third relation
    is the FastSS deletion-variant dictionary (``variants``): every
    distinct term's depth-``variant_depth`` deletion neighborhood,
    bucketed by the VARIANT — the candidate generator for fuzzy
    (edit-distance) term matching. ``write_variants=False`` defers the
    dictionary to the next compaction (the daemon-cadence small-file
    knob: fuzzy recall for terms FIRST SEEN in a deferred ingest lags
    until compaction rebuilds the dictionary; exact matches never lag
    because ``bm25_topk_fuzzy`` always keeps the raw query terms in
    its probe set). The ingest's postings are persisted across the
    writes so the tokenize aggregation runs ONCE (MEMORY_AND_DISK —
    an ingest batch, not the corpus; spilled if large). Each relation's
    shuffle hash-partitions on its bucket column, so an ingest lands
    AT MOST ONE file per touched bucket per relation."""
    postings = postings.persist()
    try:
        # the postings write runs alone first: it materializes the
        # persisted postings cache (and, transitively, the caller's
        # persisted base) exactly once. No repartition here — the
        # frame arrives hash-partitioned by pbucket from its single
        # aggregation exchange (_positional_postings_from_base), so
        # the partitionBy write already lands at most one file per
        # touched bucket
        (
            postings.write.partitionBy("pbucket")
            .mode(mode)
            .parquet(os.path.join(path, "postings"))
        )

        def _write_forward() -> None:
            (
                postings.select(
                    _term_bucket_col(
                        F.col(id_col).cast("string"), n_buckets
                    ).alias("ibucket"),
                    F.col(id_col), "term", "tf", "gen",
                )
                .repartition("ibucket")
                .write.partitionBy("ibucket")
                .mode(mode)
                .parquet(os.path.join(path, "forward"))
            )

        def _write_variants() -> None:
            (
                postings.select("term", "gen")
                .distinct()
                .select(
                    F.col("term"),
                    F.col("gen"),
                    F.explode(
                        F.expr(_deletion_variants_expr(variant_depth))
                    ).alias("variant"),
                )
                .withColumn(
                    "vbucket", _term_bucket_col(F.col("variant"), n_buckets)
                )
                .repartition("vbucket")
                .write.partitionBy("vbucket")
                .mode(mode)
                .parquet(os.path.join(path, "variants"))
            )

        # forward and variants both re-read the cached postings and
        # write to different directories — independent jobs, overlapped
        # so one write's task tail back-fills the other (guide §2.6)
        run_actions_concurrently(
            [_write_forward] + ([_write_variants] if write_variants else [])
        )
    finally:
        postings.unpersist()


def buckets_for(n_docs: int, docs_per_bucket: int = 1_000_000) -> int:
    """Corpus-scaled bucket count for a postings index — the ES
    shard-sizing analog (``lsh_params_for`` is the in-repo precedent
    for deriving layout knobs from corpus size).

    ``n_buckets`` is BOTH the index's storage layout (one partition
    directory per bucket per relation) and, since the round-14
    one-exchange ingest, the postings aggregation's parallelism cap:
    ``_positional_postings_from_base`` hash-partitions the token
    stream by ``pbucket``, so at most ``n_buckets`` tasks fold the
    aggregation. That is the right trade exactly when buckets scale
    with the corpus the way ES scales shards — a power of two at
    roughly ``docs_per_bucket`` docs per bucket (default 1M — tens of
    MB of postings per bucket at typical doc lengths), floored at 16
    so small indexes keep the local layout every test and bench pins.
    A 100 TB corpus (~10^10 docs) lands at ~16k buckets: far above any
    cluster's core count, so the aggregation cap never binds when this
    helper picks the count. Callers that hardcode ``n_buckets=16`` on
    a large corpus are accepting a 16-way ingest fold — the parameter
    is a per-index BUILD setting, deliberately never changed by later
    ingests (the layout is the index)."""
    import math

    if n_docs <= 0:
        return 16
    raw = max(1, math.ceil(n_docs / docs_per_bucket))
    return max(16, 1 << math.ceil(math.log2(raw)))


def _write_stats(path: str, stats: dict) -> None:
    tmp = os.path.join(path, ".stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(path, "stats.json"))


def build_postings_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_buckets: int = 16,
    variant_depth: int = 1,
    analyzer: Analyzer | None = None,
    stored_fields: list[str] | None = None,
    nested_fields: list[str] | None = None,
) -> None:
    """Full build (generation 0): tokenize the corpus ONCE, store the
    postings partitioned by term bucket. After this, queries never
    touch raw text again. ``variant_depth`` fixes the FastSS deletion
    depth of the fuzzy dictionary (1 = ES fuzziness 1, 2 = the ES
    fuzziness ceiling); ``analyzer`` fixes the analysis chain;
    ``stored_fields`` names non-text doc columns persisted as a
    DOC-VALUES relation (ES doc_values) so filter-context queries —
    range/term filters alongside relevance — are served from stored
    state with the predicate pushed into a columnar scan, never from
    the raw docs frame. All three are recorded in stats.json as index
    SETTINGS — probes check the depth before expanding, and every
    later ingest re-reads and applies the SAME analyzer and field
    list (changing any is a ``reindex_postings_index`` / rebuild).

    ``n_buckets`` caps the ingest aggregation's parallelism (see
    ``buckets_for``, which derives a corpus-scaled count): pick
    ``buckets_for(n_docs)`` for corpora beyond the tens of millions
    of docs rather than the local default of 16."""
    spark = docs.sparkSession
    # ONE tokenize pass for the whole build: postings, docstats and the
    # corpus scalars all derive from the persisted (id, dl, _toks)
    # frame. Before round 14 the analyzer chain ran over the full
    # corpus THREE times here (postings materialization, the docstats
    # write, and the lazy docstats re-scan under the scalar agg) —
    # guide §1.2's "don't compute things you throw away" applied to
    # the ingest path. MEMORY_AND_DISK persist: corpus-token-sized,
    # spills rather than OOMs at scale, freed before return.
    base = _tokenized_base(docs, id_col, text_col, analyzer).persist()
    try:
        postings = _positional_postings_from_base(
            base, id_col, n_buckets, gen=0
        )
        _write_index_relations(
            postings, id_col, n_buckets, path, "overwrite", variant_depth
        )
        docstats = base.select(
            F.col(id_col), F.col("dl"), F.lit(0).cast("long").alias("gen"),
        )
        # four independent tail actions over different outputs — the
        # docstats write and scalar agg read the (already-materialized)
        # cached base, doc-values projects the raw docs frame, and the
        # superseded seed is an empty local relation. Overlapped per
        # guide §2.6 instead of paying four sequential job latencies.
        tail = [
            lambda: docstats.write.mode("overwrite").parquet(
                os.path.join(path, "docstats")
            ),
            lambda: spark.createDataFrame(
                [], f"{id_col} LONG, gen LONG, by_gen LONG"
            ).write.mode("overwrite").parquet(os.path.join(path, "superseded")),
            lambda: docstats.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).collect()[0],
        ]
        if stored_fields or nested_fields:
            tail.append(
                lambda: _write_docvalues(
                    docs, id_col, stored_fields or [], n_buckets, 0,
                    path, "overwrite", nested_fields=nested_fields,
                )
            )
        agg = run_actions_concurrently(tail)[2]
    finally:
        base.unpersist()
    _write_stats(path, {
        "n_docs": agg["n"], "total_dl": int(agg["s"] or 0),
        "generation": 0, "next_gen": 1, "committed_gens": [0],
        "n_buckets": n_buckets, "id_col": id_col,
        "variant_depth": variant_depth,
        "analyzer": analyzer.to_dict() if analyzer else None,
        "stored_fields": sorted(stored_fields) if stored_fields else None,
        "nested_fields": sorted(nested_fields) if nested_fields else None,
        "text_col": text_col,
    })


def dv_col(field: str) -> Column:
    """Reference a STORED doc-values column by its literal name.
    Dotted ES field paths (``meta.lang``) are stored as literal
    column names in the docvalues relation, so reads must
    backtick-quote them — a bare ``F.col("meta.lang")`` would resolve
    a struct path instead."""
    return F.col("`" + field + "`")


def _write_docvalues(
    docs: DataFrame, id_col: str, stored_fields: list[str],
    n_buckets: int, gen: int, path: str, mode: str,
    nested_fields: list[str] | None = None,
) -> None:
    """One generation's doc-values rows: (ibucket, id, <fields>, gen),
    bucketed by the DOC id like the forward relation. One projection
    of the ingest frame — no tokenize, no shuffle beyond the bucket
    repartition that keeps it to one file per touched bucket.

    A stored field may be a DOTTED PATH into a struct column
    (``meta.lang`` — the ES object-field idiom: the reference's
    ``_source`` is nested JSON in principle, SURVEY §1.2, though it
    only ever read flat fields, ``pyCassElastic.py:272-274``): the
    path resolves through the struct at write time and is stored
    FLATTENED under its literal dotted name, exactly how ES maps
    ``{"meta": {"lang": "en"}}`` to the field ``meta.lang``.

    An array-of-objects column is ES's ``nested`` TYPE — a different
    query model (per-element match semantics, served by
    ``search_nested``) — and must be DECLARED via ``nested_fields``
    (exactly ES, where ``nested`` is an explicit mapping choice);
    nested columns are stored as-is (array<struct> doc values, one
    row per doc — never exploded, so the probe's existence scan is
    doc-sized). An UNdeclared array field keeps refusing by name —
    silently flattening it would reproduce ES's cross-object leakage
    bug, the very thing the nested type exists to prevent."""
    nested = sorted(nested_fields or [])
    proj = docs.select(
        _term_bucket_col(F.col(id_col).cast("string"), n_buckets)
        .alias("ibucket"),
        F.col(id_col),
        *[F.col(f).alias(f) for f in sorted(stored_fields)],
        *[F.col(f).alias(f) for f in nested],
        F.lit(gen).cast("long").alias("gen"),
    )
    from pyspark.sql.types import ArrayType, StructType

    for f in sorted(stored_fields):
        if isinstance(proj.schema[f].dataType, ArrayType):
            raise ValueError(
                f"stored field {f!r} is an array — declare it in "
                "nested_fields for ES 'nested'-type per-element match "
                "semantics, or store a scalar path / derived scalar "
                "column instead"
            )
    for f in nested:
        dt = proj.schema[f].dataType
        if not (isinstance(dt, ArrayType)
                and isinstance(dt.elementType, StructType)):
            raise ValueError(
                f"nested field {f!r} must be an array of structs "
                f"(ES nested type), got {dt.simpleString()}"
            )
    (
        proj
        .repartition("ibucket")
        .write.partitionBy("ibucket")
        .mode(mode)
        .parquet(os.path.join(path, "docvalues"))
    )


_COMMIT_LOCK = "commit.lock"


def _acquire_commit_lock(path: str, timeout_s: float = 10.0) -> str:
    """O_EXCL commit lock serializing the stats.json commit section
    (re-read + rewrite) of ``update_postings_index``. Without it two
    updaters could BOTH pass the pre-commit re-read in a microsecond
    window and the later ``os.replace`` would silently discard the
    earlier commit (round-9 advisor finding). Commits are milliseconds,
    so contention resolves within the bounded retry; a lock that stays
    held past ``timeout_s`` means a committer crashed INSIDE the
    commit section — loud failure with the recovery instruction
    (compaction also clears the lock, since it requires exclusive
    access anyway)."""
    import time

    lock = os.path.join(path, _COMMIT_LOCK)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return lock
        except FileExistsError:
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"commit lock {lock} held for over {timeout_s}s — a "
                    "concurrent committer crashed inside its commit "
                    "section; verify no updater is live, then delete the "
                    "lock file (or run compact_postings_index, which "
                    "clears it)"
                )
            time.sleep(0.05)


def _claim_generation(path: str, start: int) -> int:
    """Exclusively claim the next free generation number via an
    O_EXCL-created ``gen-<n>.claim`` file — the lwwstore manifest
    pattern (sources/pyds.py:_commit_manifest) applied to the index:
    two concurrent updaters can NEVER claim the same generation, so
    their data files can never collide. A crash after the claim wastes
    only a number (the claim file survives and the retry skips past
    it; compaction clears claims together with the generations)."""
    gen = start
    while True:
        try:
            fd = os.open(
                os.path.join(path, f"gen-{gen:08d}.claim"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return gen
        except FileExistsError:
            gen += 1


def update_postings_index(
    delta: DataFrame, text_col: str, path: str,
    defer_variants: bool = False,
) -> None:
    """Delta maintenance — the search twin of
    ``minhash_lsh_pairs_between``: tokenize ONLY the new batch, append
    its postings/docstats, mark any prior generation of a re-ingested
    id superseded, and adjust the corpus scalars incrementally. Work
    per ingest scales with the batch, never the corpus (the only
    corpus-sized relation touched is docstats — two narrow columns —
    to find replaced rows). Single-writer per index path, like every
    store maintenance op here.

    CRASH ATOMICITY (the lwwstore manifest contract, applied to the
    index): the stats file records the COMMITTED generation set.
    An update (1) claims a fresh generation number via an O_EXCL
    ``gen-<n>.claim`` file (``_claim_generation`` — exclusive even
    under concurrent updaters; a crash after this wastes only a
    number), (2) appends postings/docstats/superseded rows all tagged
    with that generation, then (3) commits by atomically rewriting
    stats with the generation added to ``committed_gens``. Readers
    filter every relation to committed generations (superseded rows by
    the generation that WROTE them), so a crash anywhere before step 3
    leaves orphan rows that are simply invisible — no duplicates, no
    half-applied supersede — and the retry claims a new number.
    ``compact_postings_index`` folds the committed set back to {0} and
    physically drops orphans."""
    spark = delta.sparkSession
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)
    id_col, n_buckets = stats["id_col"], stats["n_buckets"]
    committed = list(stats["committed_gens"])
    # the stored analyzer is an index setting: every ingest MUST
    # analyze exactly like the build did, or probe-time analysis
    # diverges from what the postings contain
    analyzer = Analyzer.from_dict(stats.get("analyzer"))

    # step 1: claim a generation number nothing else can ever use —
    # an O_EXCL claim file, not a read-modify-write of stats.json
    gen = _claim_generation(path, stats["next_gen"])

    # rows being replaced: COMMITTED-live docstats rows whose id is in
    # the incoming batch (the committed filter makes re-evaluation of
    # this lazy plan safe even after the appends below — uncommitted
    # rows can never leak in)
    docstats = spark.read.parquet(os.path.join(path, "docstats")).filter(
        F.col("gen").isin(committed)
    )
    superseded = (
        spark.read.parquet(os.path.join(path, "superseded"))
        .filter(F.col("by_gen").isin(committed))
        .select(id_col, "gen")
    )
    live = docstats.join(superseded, [id_col, "gen"], "left_anti")
    # replaced feeds BOTH the retraction scalars and the superseded
    # append — persist the (small: re-ingested ids only) result so the
    # docstats anti-join + semi-join run once, not twice
    replaced = live.join(
        F.broadcast(delta.select(id_col).distinct()), id_col, "semi"
    ).persist()
    # ONE tokenize pass for the whole ingest (same single-pass shape
    # as build_postings_index): postings, the docstats append and the
    # delta scalars all derive from the persisted (id, dl, _toks)
    # frame — the delta used to pay the analyzer chain three times
    base = _tokenized_base(delta, id_col, text_col, analyzer).persist()
    try:
        # step 2: data appends, all tagged with the claimed generation.
        # The postings write runs first (it materializes the persisted
        # base exactly once); the remaining actions — docstats append,
        # superseded append, the retraction/delta scalar aggs, and the
        # doc-values append — are independent jobs over different
        # outputs reading cached frames, overlapped per guide §2.6.
        # Concurrency is safe against the dirs they also read: the
        # committed-generation filters make every lazy plan immune to
        # rows appended by this very ingest (gen is unclaimed until
        # step 3), and persisted frames materialize at most once under
        # the BlockManager's per-block lock.
        postings = _positional_postings_from_base(
            base, id_col, n_buckets, gen
        )
        _write_index_relations(
            postings, id_col, n_buckets, path, "append",
            stats.get("variant_depth", 1), write_variants=not defer_variants,
        )
        new_stats = base.select(
            F.col(id_col), F.col("dl"),
            F.lit(gen).cast("long").alias("gen"),
        )
        tail = [
            lambda: new_stats.write.mode("append").parquet(
                os.path.join(path, "docstats")
            ),
            lambda: replaced.select(
                id_col, "gen", F.lit(gen).cast("long").alias("by_gen")
            ).write.mode("append").parquet(os.path.join(path, "superseded")),
            lambda: replaced.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).collect()[0],
            lambda: new_stats.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).collect()[0],
        ]
        if stats.get("stored_fields") or stats.get("nested_fields"):
            tail.append(
                lambda: _write_docvalues(
                    delta, id_col, stats.get("stored_fields") or [],
                    n_buckets, gen, path, "append",
                    nested_fields=stats.get("nested_fields"),
                )
            )
        results = run_actions_concurrently(tail)
        r, d = results[2], results[3]
    finally:
        base.unpersist()
        replaced.unpersist()

    # step 3: atomic commit — the generation becomes visible everywhere
    # at once or not at all. The commit section (re-read + rewrite) is
    # serialized by an O_EXCL commit lock so two updaters can never
    # interleave between the re-read and the write; the re-read then
    # detects a commit that landed since OUR snapshot, where the
    # replaced/scalar math is stale — fail cleanly (this update's rows
    # stay invisible orphans the next compaction drops) instead of
    # silently clobbering the other writer's commit. Single-writer per
    # index path remains the recommended deployment; this makes a
    # violation loud, not lossy.
    lock = _acquire_commit_lock(path)
    try:
        with open(os.path.join(path, "stats.json")) as f:
            current = json.load(f)
        if current["committed_gens"] != committed:
            raise RuntimeError(
                f"concurrent update committed {current['committed_gens']} "
                f"while generation {gen} was being written; generation "
                f"{gen} stays uncommitted (invisible) — re-run the update"
            )
        stats.update(
            n_docs=stats["n_docs"] + d["n"] - r["n"],
            total_dl=stats["total_dl"] + int(d["s"] or 0) - int(r["s"] or 0),
            generation=gen,
            next_gen=gen + 1,
            committed_gens=committed + [gen],
        )
        _write_stats(path, stats)
    finally:
        os.remove(lock)


#: Handle memo for ``load_postings_index``: loading an index is five
#: ``spark.read.parquet`` relation builds, and each one costs a
#: file-listing + footer schema-inference job on the driver (~0.4-0.5 s
#: per load at local scale — measured in scripts/floor_probe.py; the
#: probe families load the shared index on EVERY query). The memo key
#: is (session, canonical path, stats.json identity): every index
#: mutation commits by atomically rewriting stats.json (fresh inode +
#: mtime + generation list), so a changed index can never serve a stale
#: handle — a new commit re-lists and re-infers. This caches lazy
#: RELATIONS (file list + schema), never data: every action on a
#: memoized handle still scans the parquet inputs. Spark's own
#: catalog-table FileIndex cache is the precedent (optimization guide
#: §6 "file listing").
_LOADED_INDEX_CACHE: dict[tuple, PostingsIndex] = {}


def load_postings_index(spark: SparkSession, path: str) -> PostingsIndex:
    stats_path = os.path.join(path, "stats.json")
    st = os.stat(stats_path)
    cache_key = (
        spark.sparkContext.applicationId,
        os.path.realpath(path),
        st.st_mtime_ns,
        st.st_size,
    )
    cached = _LOADED_INDEX_CACHE.get(cache_key)
    if cached is not None:
        return cached
    with open(stats_path) as f:
        stats = json.load(f)
    committed = stats["committed_gens"]
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("gen").isin(committed)
    )
    superseded = (
        spark.read.parquet(os.path.join(path, "superseded"))
        .filter(F.col("by_gen").isin(committed))
        .select(stats["id_col"], "gen")
    )
    forward = spark.read.parquet(os.path.join(path, "forward")).filter(
        F.col("gen").isin(committed)
    )
    variants = spark.read.parquet(os.path.join(path, "variants")).filter(
        F.col("gen").isin(committed)
    )
    stored_fields = tuple(stats.get("stored_fields") or ())
    nested_fields = tuple(stats.get("nested_fields") or ())
    docvalues = None
    if stored_fields or nested_fields:
        docvalues = spark.read.parquet(
            os.path.join(path, "docvalues")
        ).filter(F.col("gen").isin(committed))
    idx = PostingsIndex(
        path=path,
        postings=postings,
        superseded=superseded,
        forward=forward,
        variants=variants,
        n_docs=stats["n_docs"],
        total_dl=stats["total_dl"],
        generation=stats["generation"],
        n_buckets=stats["n_buckets"],
        id_col=stats["id_col"],
        variant_depth=stats.get("variant_depth", 1),
        analyzer=Analyzer.from_dict(stats.get("analyzer")),
        docvalues=docvalues,
        stored_fields=stored_fields,
        nested_fields=nested_fields,
        text_col=stats.get("text_col"),
    )
    _LOADED_INDEX_CACHE[cache_key] = idx
    return idx


def set_index_alias(alias_path: str, index_path: str) -> None:
    """ES index alias: a named pointer to a physical index, swapped
    atomically — readers resolving the alias see the old index until
    the single rename, then the new one, never a mix (the alias-swap
    cutover ES's reindex workflow ends with). The alias is a JSON file
    holding the target path; the write goes to a temp file first so a
    crash mid-write can't leave a torn alias."""
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"path": index_path}, f)
    os.rename(tmp, alias_path)


def resolve_index_alias(alias_path: str) -> str:
    """Resolve an alias file to its current physical index path."""
    with open(alias_path) as f:
        return json.load(f)["path"]


def load_postings_index_by_alias(
    spark: SparkSession, alias_path: str
) -> PostingsIndex:
    """``load_postings_index`` through an alias — the reader side of
    the zero-downtime cutover: rebuild/reindex into a fresh directory,
    ``set_index_alias`` once, and every subsequent load serves the new
    index while in-flight probes keep their already-resolved one."""
    return load_postings_index(spark, resolve_index_alias(alias_path))
