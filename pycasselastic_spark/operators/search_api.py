"""ES ``_search`` request-body dispatcher: the JSON-dict API surface a
reference user actually speaks, mapped onto the stored-index operators.

The reference's whole purpose is feeding Elasticsearch so users can
POST ``_search`` bodies at it (SURVEY.md §1; ``pyCassElastic.py:316-354``
writes the documents those queries serve). The operator modules
re-express each query TYPE natively; this module closes the last API
gap — a user ports their request body, not their query plan::

    es_search(idx, {
        "query": {"bool": {
            "must": [{"match": {"text": "Scan, JOIN"}}],
            "must_not": [{"term": {"text": "window"}}],
        }},
        "size": 10,
    })

Dispatch is STRICT: an unsupported key raises with the ES feature name
(loud, never silently-wrong results). ``match`` runs the query string
through the index's stored analyzer (``PostingsIndex.analyze_terms``)
— the ingest/query analysis invariant — while ``term`` is the exact,
unanalyzed lookup, both exactly ES semantics. Every path returns the
same bounded probe plans the operator family pins in
tests/test_plans.py; the dispatcher adds zero Spark work of its own.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import PostingsIndex
from pycasselastic_spark.operators.search_probes import (
    bm25_bool_query,
    bm25_search_after,
    bm25_topk_conjunctive,
    bm25_topk_fuzzy,
    bm25_topk_indexed,
    bm25_topk_min_should_match,
    bm25_topk_multifield,
    bm25_topk_prefix,
    bm25_topk_regexp,
    bm25_topk_wildcard,
    match_phrase_prefix,
    phrase_slop_search,
)
from pycasselastic_spark.operators.search_compose import (
    boosting_search,
    constant_score_search,
    dis_max_search,
    multi_match_best_fields,
    multi_match_bool_prefix,
    multi_match_cross_fields,
    multi_match_phrase,
    search_cardinality_agg,
    search_date_histogram_agg,
    search_facet_date_histogram_agg,
    search_facet_metric_agg,
    search_percentiles_agg,
    search_range_agg,
)
from pycasselastic_spark.operators.search_ext import (
    bm25_collapse,
    bm25_topk_filtered,
    search_dv_range,
    search_dv_terms,
    search_exists,
    search_nested,
    search_facets,
    search_histogram_agg,
    search_ids,
    search_sort_by_field,
    search_stats_agg,
    terms_set_search,
    top_hits_by_facet,
)

_RANGE_OPS = {"gte": ">=", "lte": "<=", "gt": ">", "lt": "<"}


_RUNTIME_EMIT = re.compile(
    r"\s*emit\(\s*doc\['(\w[\w.]*)'\]\.value"
    r"(?:\s*([+\-*/])\s*(-?\d+(?:\.\d+)?))?\s*\)\s*$"
)

_RUNTIME_TYPES = {"long": "long", "double": "double",
                  "keyword": "string"}


def _with_runtime_fields(index: PostingsIndex, mappings: dict):
    """ES ``runtime_mappings``: derive query-time fields from stored
    doc-values and expose them as first-class fields — every range /
    term / exists filter and every doc-values aggregation downstream
    sees them transparently, because the computed column rides the
    doc-values scan's PROJECTION (Catalyst keeps it inside the same
    stage; pushdown on the base columns is unchanged). Supported
    Painless: ``emit(doc['f'].value)`` and ``emit(doc['f'].value <op>
    <literal>)`` with one of ``+ - * /`` — the re-scale/re-bucket
    shapes runtime fields are actually used for; scripts beyond one
    expression raise by name. The emitted NULL law is ES's: a doc
    missing the source field emits nothing (stays NULL)."""
    import dataclasses

    dv = index.live_docvalues()
    new_fields = []
    for name, spec in mappings.items():
        extra = set(spec) - {"type", "script"}
        if extra:
            raise _err(f"runtime field options {sorted(extra)}")
        rtype = _RUNTIME_TYPES.get(str(spec.get("type")))
        if rtype is None:
            raise _err(
                f"runtime field type {spec.get('type')!r} "
                f"(supported: {sorted(_RUNTIME_TYPES)})"
            )
        script = spec.get("script")
        if not isinstance(script, dict) or "source" not in script:
            raise _err(f"runtime field {name!r} without script.source")
        m = _RUNTIME_EMIT.fullmatch(str(script["source"]))
        if not m:
            raise _err(
                f"runtime script {script['source']!r} (supported: "
                "emit(doc['f'].value) / emit(doc['f'].value <op> "
                "<literal>))"
            )
        src, op, lit = m.group(1), m.group(2), m.group(3)
        if src not in index.stored_fields:
            raise _err(
                f"runtime field {name!r} reads {src!r} which is not "
                f"stored (stored_fields={list(index.stored_fields)})"
            )
        if name in index.stored_fields or name in (index.text_col,):
            raise _err(
                f"runtime field {name!r} shadows an existing field"
            )
        col = F.col(f"`{src}`")
        if op is not None:
            litval = float(lit) if "." in lit else int(lit)
            if op == "/" and litval == 0:
                raise _err(f"runtime field {name!r} divides by zero")
            col = {
                "+": col + F.lit(litval), "-": col - F.lit(litval),
                "*": col * F.lit(litval), "/": col / F.lit(litval),
            }[op]
        dv = dv.withColumn(name, col.cast(rtype))
        new_fields.append(name)
    # the wrapper's docvalues are already superseded-folded
    # (live_docvalues ran above); live_docvalues() on the wrapper
    # re-applies the anti-join, which is idempotent — generation is
    # left untouched because the POSTINGS side still needs it
    return dataclasses.replace(
        index,
        docvalues=dv,
        stored_fields=tuple(index.stored_fields) + tuple(new_fields),
    )


def _check_text_field(index: PostingsIndex, field: str, what: str) -> None:
    """A request body naming the analyzed text field must name it
    CORRECTLY — a typo silently served from the real text field is
    the wrong-field answer this engine's contract forbids (round-14
    review finding). Indexes store their text column name since round
    14; older stats.json files lack it, where the best available
    check is rejecting doc-values collisions."""
    if index.text_col is not None:
        if field != index.text_col:
            raise _err(
                f"{what} field {field!r} (this index analyzed "
                f"{index.text_col!r}; doc-values fields: "
                f"{list(index.stored_fields)})"
            )
        return
    if field in index.stored_fields:
        raise _err(
            f"{what} over doc-values field {field!r} (the indexed "
            "TEXT field only — that is what this index analyzed)"
        )


def _filter_predicates(clauses: list) -> list:
    """ES filter-context clauses -> (field, op, value) triples for
    ``bm25_topk_filtered`` — ``range`` and exact ``term`` filters,
    evaluated against the index's STORED doc values (never a docs
    frame; non-scoring, exactly ES filter semantics)."""
    preds = []
    for clause in clauses:
        kind, body = _single(clause, "filter clause")
        if kind == "range":
            field, spec = _single(body, "range")
            extra = set(spec) - set(_RANGE_OPS)
            if extra:
                raise _err(f"range options {sorted(extra)}")
            for es_op, op in _RANGE_OPS.items():
                if es_op in spec:
                    preds.append((field, op, spec[es_op]))
        elif kind == "term":
            field, value = _single(body, "term filter")
            preds.append((field, "=", value))
        elif kind == "exists":
            if set(body) != {"field"}:
                raise _err(
                    f"exists filter options {sorted(set(body) - {'field'})}"
                )
            preds.append((body["field"], "exists", None))
        elif kind == "nested":
            if set(body) != {"path", "query"}:
                raise _err(
                    f"nested filter options "
                    f"{sorted(set(body) - {'path', 'query'})}"
                )
            npath, inner = body["path"], body["query"]
            ikind, ibody = _single(inner, "nested filter inner query")
            leaves = (
                ibody.get("must", []) if ikind == "bool" else [inner]
            )
            if ikind == "bool" and set(ibody) != {"must"}:
                raise _err(
                    f"nested filter bool clauses "
                    f"{sorted(set(ibody) - {'must'})}"
                )
            conditions = []
            for leaf in leaves:
                lkind, lbody = _single(leaf, "nested filter leaf")
                field, spec = _single(lbody, f"nested filter {lkind}")
                if not field.startswith(npath + "."):
                    raise _err(
                        f"nested filter leaf field {field!r} outside "
                        f"path {npath!r}"
                    )
                sub = field[len(npath) + 1:]
                if lkind == "term":
                    conditions.append((sub, "=", spec))
                elif lkind == "range":
                    extra = set(spec) - set(_RANGE_OPS)
                    if extra:
                        raise _err(
                            f"nested filter range options {sorted(extra)}"
                        )
                    for es_op, op in _RANGE_OPS.items():
                        if es_op in spec:
                            conditions.append((sub, op, spec[es_op]))
                else:
                    raise _err(f"nested filter leaf type {lkind!r}")
            preds.append((npath, "nested", conditions))
        elif kind == "not":
            # legacy ES 1.x not-filter — the exact clause the
            # reference appends for ignore_same_source
            # (pyCassElastic.py:391-397); only the term form it emits.
            # ES KEEPS a doc whose field is missing (it can't match
            # the term, so the negation passes it) — the null-safe op,
            # not plain !=, which silently drops NULL-valued docs
            ikind, ibody = _single(body, "not filter inner")
            if ikind != "term":
                raise _err(f"not filter over {ikind!r} (term only)")
            field, value = _single(ibody, "not.term")
            preds.append((field, "!=~", value))
        else:
            raise _err(f"filter clause type {kind!r}")
    return preds


def _err(what: str) -> ValueError:
    return ValueError(f"es_search: unsupported {what}")


def _single(d: dict, what: str) -> tuple[str, object]:
    if not isinstance(d, dict) or len(d) != 1:
        raise _err(f"{what} (expected a single-key object, got {d!r})")
    return next(iter(d.items()))


def _match_text(q: dict, context: str) -> str:
    """Query text of a ``match`` body for contexts that dispatch only
    the plain form (sort / aggs / collapse / hybrid): the dict form is
    accepted ONLY when it carries nothing but ``query`` — analyzing a
    dict's repr would silently yield a garbage hit set, the
    dispatcher's forbidden failure mode (round-12 advisor finding)."""
    _field, spec = _single(q, "match")
    if isinstance(spec, dict):
        extra = set(spec) - {"query"}
        if extra:
            raise _err(f"match options {sorted(extra)} under {context}")
        spec = spec["query"]
    return str(spec)


def _clause_terms(index: PostingsIndex, clause: dict) -> list[str]:
    """Terms contributed by one leaf clause inside ``bool`` — ``match``
    analyzes, ``term`` is exact (ES semantics)."""
    kind, body = _single(clause, "bool clause")
    if kind == "match":
        _field, text = _single(body, "match")
        return index.analyze_text(str(text))
    if kind == "term":
        _field, value = _single(body, "term")
        return [str(value)]
    raise _err(f"bool clause type {kind!r}")


def _agg_scope(index: PostingsIndex, qtype: str, q):
    """The hit scope an aggregation runs over: analyzed TERMS for a
    match query (the fast path every agg function already speaks), or
    a derived hit-id RELATION for the other dispatched query types —
    ES lets an aggregation ride ANY query, so restricting aggs to
    match (the round-12 state) refused real request shapes; the hit
    set is derived ONCE here and shared by every agg through
    ``hits_relation``. Scoring-dependent aggs (top_hits) stay
    match-only — they need the probe's scores, not just its ids."""
    from pycasselastic_spark.operators.search_hybrid import filtered_ids
    from pycasselastic_spark.operators.search_index import dv_col

    id_col = index.id_col
    if qtype == "match":
        return index.analyze_text(_match_text(q, "aggs"))
    if qtype == "term":
        _f, v = _single(q, "term")
        return index.live_postings_for([str(v)]).select(id_col).distinct()
    if qtype == "match_all":
        if q:
            raise _err(f"match_all options {sorted(q)}")
        base = (
            index.live_docvalues()
            if index.stored_fields
            else index.live_forward()
        )
        return base.select(id_col).distinct()
    if qtype == "exists":
        if set(q) != {"field"}:
            raise _err(f"exists options {sorted(set(q) - {'field'})}")
        return filtered_ids(index, [(q["field"], "exists", None)])
    if qtype == "range":
        field, spec = _single(q, "range")
        extra = set(spec) - set(_RANGE_OPS)
        if extra:
            raise _err(f"range options {sorted(extra)}")
        preds = [
            (field, op, spec[es_op])
            for es_op, op in _RANGE_OPS.items()
            if es_op in spec
        ]
        return filtered_ids(index, preds)
    if qtype == "terms":
        field, values = _single(q, "terms")
        if not isinstance(values, (list, tuple)):
            raise _err(f"terms body {values!r} (expected a value list)")
        if field not in index.stored_fields:
            raise _err(
                f"terms field {field!r} is not stored "
                f"(stored_fields={index.stored_fields})"
            )
        dv = index.live_docvalues()
        return (
            dv.filter(dv_col(field).isin(list(values)))
            .select(id_col)
            .distinct()
        )
    if qtype == "bool":
        extra = set(q) - {"must", "must_not"}
        if extra:
            raise _err(
                f"aggs under bool options {sorted(extra)} "
                "(must/must_not only)"
            )
        musts = q.get("must", [])
        if not musts:
            raise _err("aggs under bool without must clauses")
        ids = None
        for c in musts:
            terms = _clause_terms(index, c)
            if not terms:
                raise _err(f"must clause analyzing to no terms: {c!r}")
            cl = index.live_postings_for(terms).select(id_col).distinct()
            ids = cl if ids is None else ids.join(cl, id_col, "semi")
        for c in q.get("must_not", []):
            nterms = _clause_terms(index, c)
            if not nterms:
                # an exclusion analyzing to nothing would silently NOT
                # apply — for delete_by_query that means deleting docs
                # the caller explicitly protected (same law as the
                # simple_query_string must_not path)
                raise _err(f"must_not clause analyzing to no terms: {c!r}")
            veto = (
                index.live_postings_for(nterms)
                .select(id_col)
                .distinct()
            )
            ids = ids.join(veto, id_col, "anti")
        return ids
    raise _err(f"aggs under query type {qtype!r}")


def _sqs_tokens(s: str) -> list[tuple]:
    """Tokenize the ``simple_query_string`` grammar into
    ``(sign, kind, value, opt)`` tuples — sign in {'', '+', '-'},
    kind in {'term', 'phrase' (opt=slop), 'prefix', 'fuzzy'
    (opt=max edit distance), 'group' (value=list of alternatives),
    'or'}. Lucene's SimpleQueryParser is error-forgiving (it treats
    broken syntax as literal text); this dispatcher is deliberately
    STRICT instead — malformed syntax raises by name, because
    silently scoring a half-understood query is how search APIs
    corrupt downstream evaluations."""
    toks: list[tuple] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        sign = ""
        if ch in "+-":
            sign = ch
            i += 1
            if i >= n or s[i].isspace():
                raise _err(f"simple_query_string dangling {sign!r}")
            ch = s[i]
        if ch == '"':
            j = s.find('"', i + 1)
            if j < 0:
                raise _err("simple_query_string unterminated phrase quote")
            text = s[i + 1:j]
            i = j + 1
            slop = 0
            m = re.match(r"~(\d+)", s[i:])
            if m:
                # "a b"~N is phrase SLOP in this grammar (after a bare
                # word ~N is fuzziness)
                slop = int(m.group(1))
                i += m.end()
            toks.append((sign, "phrase", text, slop))
        elif ch == "(":
            j = s.find(")", i + 1)
            if j < 0:
                raise _err("simple_query_string unterminated group")
            inner = s[i + 1:j]
            i = j + 1
            if any(c in inner for c in '"()*~'):
                raise _err(
                    f"simple_query_string nested syntax in group ({inner!r})"
                )
            alts = [a.strip() for a in inner.split("|")]
            if not alts or any(not a for a in alts):
                raise _err(
                    f"simple_query_string empty group alternative "
                    f"({inner!r})"
                )
            if any(" " in a for a in alts):
                # (a b | c) would need AND-inside-OR precedence —
                # raise rather than silently flatten
                raise _err(
                    "simple_query_string multi-word group alternative "
                    f"({inner!r})"
                )
            toks.append((sign, "group", alts, None))
        elif ch == "|":
            if sign:
                raise _err(f"simple_query_string {sign!r} before '|'")
            toks.append(("", "or", None, None))
            i += 1
        else:
            m = re.match(r'[^\s()|"]+', s[i:])
            word = m.group(0)
            i += m.end()
            if "~" in word:
                base, _, d = word.rpartition("~")
                if not d.isdigit() or not base or "*" in base or "~" in base:
                    raise _err(
                        f"simple_query_string fuzzy syntax in {word!r}"
                    )
                toks.append((sign, "fuzzy", base, int(d)))
            elif word.endswith("*"):
                if "*" in word[:-1] or len(word) == 1:
                    raise _err(
                        f"simple_query_string wildcard syntax in {word!r} "
                        "(only a trailing '*' prefix is dispatched)"
                    )
                toks.append((sign, "prefix", word[:-1], None))
            elif "*" in word:
                raise _err(
                    f"simple_query_string non-trailing wildcard in {word!r}"
                )
            else:
                toks.append((sign, "term", word, None))
    return toks


def _dispatch_simple_query_string(
    index: PostingsIndex, q: dict, size: int
) -> DataFrame:
    """Compile a ``simple_query_string`` body onto the standalone
    probes: a whole-query phrase / trailing-``*`` prefix / ``~N``
    fuzzy token dispatches to its dedicated probe
    (``phrase_slop_search`` / ``bm25_topk_prefix`` /
    ``bm25_topk_fuzzy``); boolean mixes of bare terms, ``+``/``-``
    operators, ``|`` separators and parenthesized OR-groups compile
    onto ``bm25_bool_query`` (a group is one clause whose analyzed
    alternatives OR — exactly the per-clause semantics the bool probe
    implements). Phrase/prefix/fuzzy MIXED with other clauses would
    need a composed scoring law the probes don't share — raises by
    name."""
    extra = set(q) - {"query", "default_operator"}
    if extra:
        raise _err(f"simple_query_string options {sorted(extra)}")
    default_op = str(q.get("default_operator", "or")).lower()
    if default_op not in ("or", "and"):
        raise _err(f"simple_query_string default_operator {default_op!r}")
    toks = _sqs_tokens(str(q["query"]))
    if not toks:
        raise _err("simple_query_string with no clause")
    specials = [t for t in toks if t[1] in ("phrase", "prefix", "fuzzy")]
    if len(toks) == 1 and specials:
        sign, kind, val, opt = toks[0]
        if sign == "-":
            raise _err("simple_query_string with no scoring clause")
        if kind == "phrase":
            terms = index.analyze_text(val)
            if not terms:
                raise _err(
                    f"simple_query_string phrase analyzing to no terms: "
                    f"{val!r}"
                )
            if len(terms) == 1:
                # a one-word phrase IS the term query
                return bm25_topk_indexed(index, terms, k=size)
            return phrase_slop_search(index, terms, slop=opt)
        if kind == "prefix":
            return bm25_topk_prefix(index, val, k=size)
        return bm25_topk_fuzzy(index, [val], k=size, max_dist=opt)
    if specials:
        raise _err(
            "simple_query_string phrase/prefix/fuzzy combined with other "
            f"clauses ({[t[1] for t in specials]} — the composed scoring "
            "law is not dispatched)"
        )
    must, should, must_not = [], [], []
    for sign, kind, val, _opt in toks:
        if kind == "or":
            if default_op == "and":
                # 'a | b' under default_operator=and means (a OR b)
                # with precedence — use a parenthesized group;
                # silently AND-ing both terms is exactly the
                # forbidden failure mode
                raise _err(
                    "simple_query_string '|' under default_operator=and "
                    "outside a group (use parentheses for precedence)"
                )
            # bare OR separator — OR is already the combinator for
            # optional clauses
            continue
        alts = val if kind == "group" else [val]
        terms = [t for a in alts for t in index.analyze_text(a)]
        if sign == "-":
            if not terms:
                # mirror the must path: an exclusion the user asked
                # for silently not applying is the same failure mode
                # (round-12 advisor finding)
                raise _err(
                    "simple_query_string must_not clause analyzing to "
                    f"no terms: {alts!r}"
                )
            must_not.extend(terms)
        elif sign == "+" or default_op == "and":
            if not terms:
                raise _err(
                    "simple_query_string required clause analyzing to "
                    f"no terms: {alts!r}"
                )
            must.append(terms)
        else:
            should.extend(terms)
    if not must and not should:
        raise _err("simple_query_string with no scoring clause")
    return bm25_bool_query(
        index, must=must, should=should, must_not=must_not, k=size
    )


def es_search(
    index: PostingsIndex,
    body: dict,
    docs: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    field_indexes: dict[str, PostingsIndex] | None = None,
    join_field: DataFrame | None = None,
    join_relations: dict | None = None,
) -> DataFrame:
    """Execute an ES ``_search`` request body against a stored index.

    Supported surface (each key maps 1:1 onto an operator whose plan
    shape and oracle the catalog already pins):

    - ``query``: ``match`` (analyzed, OR semantics; optional
      ``minimum_should_match`` / ``fuzziness`` / ``operator`` or|and —
      and = the conjunctive probe), ``match_all`` (live-doc id page),
      ``fuzzy`` (standalone term-level edit-distance query),
      ``term`` (exact),
      ``match_phrase`` (+``slop``), ``match_phrase_prefix``,
      ``prefix``, ``wildcard``, ``regexp``, ``exists`` (stored
      doc-values non-NULL scan), ``ids`` (live-doc batch lookup),
      ``terms_set`` (per-doc threshold from a stored
      ``minimum_should_match_field``), ``range`` / ``terms``
      (constant-score stored doc-values bounds / IN-list),
      ``dis_max`` (+``tie_breaker``), ``boosting``
      (+``negative_boost``), ``simple_query_string`` (the full
      grammar: +/- operators, ``|`` separators, parenthesized
      OR-groups for precedence, default_operator or/and, and
      whole-query ``"quoted phrase"``(+``~slop``) / trailing-``*``
      prefix / ``~N`` fuzzy tokens compiled onto their standalone
      probes; specials mixed with other clauses raise),
      ``constant_score`` (single clause,
      ``bool.must``, or the reference's legacy ``and`` list with
      ``not.term`` — ``pyCassElastic.py:366-397``), ``multi_match``
      (all four types — ``best_fields`` / ``most_fields`` (+ caret
      boosts) / ``phrase`` (+``slop``) / ``cross_fields`` — over
      per-field indexes passed via ``field_indexes``),
      ``query_string`` (the Lucene grammar incl. ``field:`` scoping
      via ``field_indexes``, integer ``^boosts``, ``f:[a TO b]``
      doc-values ranges — ``operators/search_qs.py``), the full span
      family (``span_near`` / ``span_first`` / ``span_or`` /
      ``span_not`` / ``span_containing`` / ``span_within`` over the
      stored-position algebra), ``has_child`` / ``has_parent``
      (join-field parent/child semantics over the (id, join_name,
      parent) relation passed via ``join_field`` +
      ``join_relations`` — score_mode none/sum/max/min/avg, parent
      score propagation), and ``bool``
      with ``must`` / ``should`` / ``must_not`` lists of match/term
      leaves plus bool-level ``minimum_should_match`` (N of the
      should CLAUSES required).
    - ``size`` (default 10) and ``search_after`` ([score_q20, id] —
      the (score desc, id asc) cursor, match-only).
    - ``highlight`` {"fields": {field: {}}} under a match query:
      the ranked hits each carrying a 5-token snippet at the first
      match position (needs the ``docs`` frame for the stored-field
      fetch).
    - ``suggest`` (query-less allowed): one named suggester, the
      ``term`` (did-you-mean over the FastSS dictionary) or
      ``phrase`` (bigram-frequency-ranked) form.
    - ``collapse`` {"field": ...} and ``aggs`` with ONE ``terms``
      facet, optionally carrying a ``top_hits`` sub-aggregation —
      these need the ``docs`` frame for the stored-field fetch.
    - ``aggs`` metric/bucket forms over STORED doc-values (no docs
      frame): ``stats``, ``histogram``, ``percentiles`` (exact),
      ``boxplot`` (exact), ``cardinality`` (exact), ``range``,
      ``date_histogram`` (calendar_interval
      hour/day/week/month/quarter/year, or fixed_interval <n>s/m/h/d,
      with min_doc_count=0 + extended_bounds zero-fill) — plus the
      pipeline riders ``cumulative_sum`` / ``derivative`` /
      ``serial_diff`` / ``moving_fn`` (unweightedAvg/sum/min/max) /
      ``moving_avg`` (simple) / ``rate`` on fixed-interval parents /
      ``normalize`` (percent_of_sum / rescale_0_1 / z-score),
      ``top_metrics`` and ``bucket_script`` (arithmetic over
      buckets_path) under ``terms``, ``string_stats`` (incl. the
      Q30-deterministic character entropy), ``matrix_stats`` (the
      two-field covariance/correlation form), ``t_test``
      (Welch/pooled statistic + df; the p-value CDF is the
      documented divergence), ``diversified_sampler``
      (per-value-capped top-scoring sample), and
      ``significant_terms`` /
      ``significant_text`` (jlh / chi_square / percentage) under
      match queries. Aggregations compose with ANY
      dispatched hit-defining query — match / term / match_all /
      exists / range / terms / bool(must, must_not) — the hit set is
      derived once and shared (top_hits stays match-only: it needs
      scores).
    - top-level ``knn`` (ES 8.x): exact cosine retrieval over the
      ``embeddings`` frame from a literal ``query_vector``
      (num_candidates accepted — exact search is its limit), with
      optional ``knn.filter`` (term / range / exists / not.term
      clauses against STORED doc-values — the pre-filter, so all k
      survivors pass). ``knn`` BESIDE a match ``query`` is the hybrid
      body: ES's default additive combination (lexical Q20 +
      floor(knn.boost x cosine x Q20) over the union of both hit
      sets), or reciprocal rank fusion when ``rank: {rrf: ...}`` is
      present (rank_constant / rank_window_size dispatched).

    Anything else raises naming the feature — a silently-dropped
    clause is how search APIs corrupt downstream evaluations.
    """
    unknown = set(body) - {
        "query", "size", "search_after", "collapse", "aggs", "sort", "knn",
        "rank", "highlight", "suggest", "rescore", "fields",
        "runtime_mappings",
    }
    if unknown:
        raise _err(f"body keys {sorted(unknown)}")
    size = int(body.get("size", 10))

    if "runtime_mappings" in body:
        # ES runtime fields: computed at query time from stored
        # doc-values, then usable anywhere a stored field is — the
        # natural Catalyst fit (the expression rides the scan's
        # projection). The dispatched Painless grammar is one emit of
        # one doc-value, optionally through one arithmetic op with a
        # literal; anything else raises by name.
        index = _with_runtime_fields(index, body["runtime_mappings"])
        body = {k: v for k, v in body.items() if k != "runtime_mappings"}

    if "suggest" in body:
        # suggest-only request (ES allows it with no query) — one
        # named suggester, term or phrase form
        if set(body) - {"suggest", "size"}:
            raise _err(
                f"suggest combined with {sorted(set(body) - {'suggest', 'size'})}"
            )
        _sname, spec = _single(body["suggest"], "suggest")
        if isinstance(spec, dict) and "completion" in spec:
            # autocomplete: prefix in, popularity-ranked terms out
            if set(spec) != {"prefix", "completion"}:
                raise _err(
                    f"completion suggest body {sorted(spec)} "
                    "(expected prefix + completion)"
                )
            copts = spec["completion"]
            cextra = set(copts) - {"field", "size", "skip_duplicates"}
            if cextra:
                raise _err(f"completion options {sorted(cextra)}")
            if "field" in copts:
                _check_text_field(
                    index, str(copts["field"]), "completion"
                )
            if not bool(copts.get("skip_duplicates", True)):
                # the dictionary is distinct by construction; a
                # duplicate-emitting mode would be a lie
                raise _err("completion skip_duplicates=false")
            from pycasselastic_spark.operators.search_ext import (
                suggest_completion,
            )

            return suggest_completion(
                index, str(spec["prefix"]),
                k=int(copts.get("size", 5)),
            )
        if (
            not isinstance(spec, dict)
            or "text" not in spec
            or ("term" in spec) == ("phrase" in spec)
            or set(spec) - {"text", "term", "phrase"}
        ):
            raise _err(
                "suggest body (expected text + exactly one of term/phrase)"
            )
        from pycasselastic_spark.operators.search_ext import (
            suggest_phrase,
            suggest_terms,
        )

        text = str(spec["text"])
        kind = "term" if "term" in spec else "phrase"
        opts = spec[kind]
        extra = set(opts) - {"field", "size", "max_edits"}
        if extra:
            raise _err(f"{kind} suggester options {sorted(extra)}")
        toks = text.split()
        if kind == "term":
            if len(toks) != 1:
                raise _err(
                    "term suggester over multi-token text (use phrase)"
                )
            me = opts.get("max_edits")
            return suggest_terms(
                index, toks[0], k=int(opts.get("size", 5)),
                max_dist=None if me is None else int(me),
            )
        if len(toks) < 2:
            raise _err("phrase suggester needs at least two tokens")
        return suggest_phrase(
            index, toks, k=int(opts.get("size", 3)),
            max_dist=int(opts.get("max_edits", 1)),
        )

    if "knn" in body:
        # ES 8.x top-level kNN retrieval. EXACT search over the
        # embeddings frame (ES's HNSW is approximate by necessity;
        # num_candidates is its recall dial, accepted here because the
        # exact answer is what any num_candidates converges to — the
        # banded/IVF ANN twins remain the scale path).
        extra_body = set(body) - {"knn", "size", "query", "rank"}
        if extra_body:
            raise _err(f"knn combined with {sorted(extra_body)}")
        spec = body["knn"]
        if not isinstance(spec, (list, tuple)):
            extra = set(spec) - {
                "field", "query_vector", "k", "num_candidates", "filter",
                "boost", "similarity",
            }
            if extra:
                raise _err(f"knn options {sorted(extra)}")
            if "similarity" in spec and "query" in body:
                # the cutoff composes with the standalone retrieval;
                # under a hybrid body its interaction with the lexical
                # leg is a different law — raise by name
                raise _err("knn similarity under a hybrid body")
        if embeddings is None:
            raise _err("knn without an embeddings frame")
        from pycasselastic_spark.operators.search_hybrid import (
            filtered_ids,
            hybrid_knn_bm25,
            hybrid_rrf_from_vector,
            knn_literal_topk,
            multi_knn_bm25,
        )

        if isinstance(spec, (list, tuple)):
            # ES 8.7+ multi-kNN: a LIST of clauses, contributions
            # summed (optionally beside a lexical match query)
            if "rank" in body:
                raise _err("rank with a multi-clause knn list")
            specs = []
            for clause in spec:
                cextra = set(clause) - {
                    "field", "query_vector", "k", "num_candidates",
                    "filter", "boost",
                }
                if cextra:
                    raise _err(f"knn clause options {sorted(cextra)}")
                cfilters = None
                if "filter" in clause:
                    fcl = clause["filter"]
                    if isinstance(fcl, dict):
                        fcl = [fcl]
                    cfilters = _filter_predicates(list(fcl))
                specs.append({
                    "vec": [float(x) for x in clause["query_vector"]],
                    "k": int(clause.get("k", size)),
                    "boost": float(clause.get("boost", 1.0)),
                    "vec_col": clause["field"],
                    "filters": cfilters,
                })
            terms = None
            if "query" in body:
                qtype2, q2 = _single(body["query"], "query")
                if qtype2 != "match":
                    raise _err(f"knn combined with query type {qtype2!r}")
                terms = index.analyze_text(_match_text(q2, "hybrid knn"))
                if not terms:
                    raise _err(
                        "hybrid knn lexical query analyzing to no terms"
                    )
            return multi_knn_bm25(
                index, embeddings, terms, specs, k=size
            )

        field = spec["field"]
        k = int(spec.get("k", size))
        vec = [float(x) for x in spec["query_vector"]]
        knn_filters = None
        if "filter" in spec:
            clauses = spec["filter"]
            if isinstance(clauses, dict):
                clauses = [clauses]
            knn_filters = _filter_predicates(list(clauses))
        if "query" in body:
            # hybrid lexical+kNN in ONE body — the RAG request shape
            qtype2, q2 = _single(body["query"], "query")
            if qtype2 != "match":
                raise _err(f"knn combined with query type {qtype2!r}")
            terms = index.analyze_text(_match_text(q2, "hybrid knn"))
            if not terms:
                raise _err("hybrid knn lexical query analyzing to no terms")
            if "rank" in body:
                rkind, rspec = _single(body["rank"], "rank")
                if rkind != "rrf":
                    raise _err(f"rank type {rkind!r}")
                rextra = set(rspec) - {"rank_window_size", "rank_constant"}
                if rextra:
                    raise _err(f"rrf options {sorted(rextra)}")
                window = int(rspec.get("rank_window_size", max(size, k)))
                return hybrid_rrf_from_vector(
                    index, embeddings, terms, vec, k=size,
                    k_rrf=int(rspec.get("rank_constant", 60)),
                    n_text=window, n_knn=window,
                    emb_vec_col=field, knn_filters=knn_filters,
                )
            return hybrid_knn_bm25(
                index, embeddings, terms, vec, k=size, knn_k=k,
                knn_boost=float(spec.get("boost", 1.0)),
                emb_vec_col=field, knn_filters=knn_filters,
            )
        if "rank" in body:
            raise _err("rank without both knn and query")
        if "boost" in spec:
            # standalone knn scores ARE the cosine column; scaling it
            # without a second leg to combine against would silently
            # change reported similarities
            raise _err("knn boost without a lexical query")
        allowed = None
        if knn_filters:
            allowed = filtered_ids(index, knn_filters).withColumnRenamed(
                index.id_col, "vec_id"
            )
        out = knn_literal_topk(
            embeddings, vec, k, id_col="vec_id", vec_col=field,
            allowed_ids=allowed,
        ).select(F.col("match_id").alias("vec_id"), "cosine")
        if "similarity" in spec:
            # ES 8.8 knn.similarity: the minimum-similarity cutoff —
            # neighbors below it are dropped even inside the top-k
            out = out.filter(
                F.col("cosine") >= F.lit(float(spec["similarity"]))
            )
        return (
            out.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            # ES retrieves k neighbors, then the page is still bounded
            # by size (default 10) — min(k, size) hits come back
            .limit(min(k, size))
        )

    if "rank" in body:
        raise _err("rank without a knn clause")

    # each of these sections SHAPES the one result frame a dispatch
    # returns; two at once would mean one silently wins — raise (ES
    # returns hits + aggs side by side in one response envelope; this
    # API returns one DataFrame per request, so combinations are a
    # second request, never a silent drop)
    shaping = [
        k for k in ("sort", "aggs", "collapse", "highlight", "rescore")
        if k in body
    ]
    if len(shaping) > 1:
        raise _err(
            f"combined body sections {shaping} (one result-shaping "
            "section per request)"
        )
    if "search_after" in body and shaping and shaping[0] != "sort":
        raise _err(f"search_after combined with {shaping[0]}")

    if "fields" in body:
        # ES ``fields``: hits carry the named STORED fields — the
        # response shape every client that renders results requests.
        # Served from doc-values (the columnar _source this engine
        # keeps); the fetch joins the k-bounded hit page, so the
        # doc-values scan is id-pruned by a broadcast of at most
        # ``size`` ids.
        if shaping:
            raise _err(f"fields combined with {shaping[0]}")
        if "search_after" in body or "knn" in body:
            raise _err("fields combined with search_after/knn")
        flist = list(body["fields"])
        if not flist:
            raise _err("fields with an empty list")
        missing_f = [f for f in flist if f not in index.stored_fields]
        if missing_f:
            raise _err(
                f"fields {missing_f} without doc-values "
                f"(stored_fields={list(index.stored_fields)})"
            )
        from pycasselastic_spark.operators.search_index import dv_col

        inner_body = {k: v for k, v in body.items() if k != "fields"}
        hits_page = es_search(
            index, inner_body, docs=docs, embeddings=embeddings,
            field_indexes=field_indexes,
        )
        id_col = index.id_col
        if id_col not in hits_page.columns:
            raise _err(
                f"fields under a query returning no {id_col} column"
            )
        dvf = index.live_docvalues().select(
            F.col(id_col), *[dv_col(f).alias(f) for f in flist]
        )
        return (
            hits_page.join(F.broadcast(dvf.join(
                F.broadcast(hits_page.select(id_col)), id_col, "semi"
            )), id_col, "left")
            .orderBy(
                *( [F.col("score_q20").desc()]
                   if "score_q20" in hits_page.columns else [] ),
                F.col(id_col).asc(),
            )
        )

    qtype, q = _single(body.get("query", {}), "query")

    if qtype == "wrapper":
        # ES ``wrapper``: a base64-encoded query embedded by tooling
        # that can't emit raw JSON (templating layers, signed query
        # pass-through). Decode ITERATIVELY with a depth bound — a
        # wrapper-in-wrapper bomb must fail by name, not by stack
        # exhaustion — then re-dispatch; every strictness rule applies
        # to the decoded query unchanged.
        import base64
        import json as _json

        depth = 0
        while qtype == "wrapper":
            depth += 1
            if depth > 3:
                raise _err("wrapper nesting deeper than 3")
            if set(q) != {"query"}:
                raise _err(f"wrapper options {sorted(set(q) - {'query'})}")
            try:
                inner = _json.loads(base64.b64decode(str(q["query"])))
            except Exception:
                raise _err("wrapper payload (not base64-encoded JSON)")
            if not isinstance(inner, dict):
                raise _err("wrapper payload (decoded to a non-object)")
            qtype, q = _single(inner, "query")
        rebuilt = dict(body)
        rebuilt["query"] = inner
        return es_search(
            index, rebuilt, docs=docs, embeddings=embeddings,
            field_indexes=field_indexes,
        )

    if "sort" in body:
        # field sort (ES disables scoring under it): one doc-values
        # field + the implicit id tiebreak; anything fancier raises.
        # search_after under the sort is the (field_value, id) cursor
        # — previously a cursor here would have been silently ignored
        # and page one returned again
        if qtype != "match" or len(body["sort"]) != 1:
            raise _err("sort (supported: one field under a match query)")
        field, direction = _single(body["sort"][0], "sort clause")
        if direction not in ("asc", "desc"):
            raise _err(f"sort direction {direction!r}")
        after = None
        if "search_after" in body:
            cursor = list(body["search_after"])
            if len(cursor) != 2:
                raise _err(
                    "search_after cursor under a field sort (expected "
                    "[field_value, id])"
                )
            after = (cursor[0], cursor[1])
        return search_sort_by_field(
            index, index.analyze_text(_match_text(q, "sort")), field,
            ascending=direction == "asc", k=size, after=after,
        )

    if "rescore" in body:
        # the _search body's rescore key: rerank only the top
        # window_size hits of the cheap base query with a second query
        if set(body) - {"rescore", "query", "size"}:
            raise _err(
                "rescore combined with "
                f"{sorted(set(body) - {'rescore', 'query', 'size'})}"
            )
        if qtype != "match":
            raise _err(f"rescore under query type {qtype!r}")
        rs = body["rescore"]
        rextra = set(rs) - {"window_size", "query"}
        if rextra:
            raise _err(f"rescore options {sorted(rextra)}")
        rq = rs.get("query")
        if not isinstance(rq, dict) or "rescore_query" not in rq:
            raise _err("rescore body (expected query.rescore_query)")
        rqextra = set(rq) - {
            "rescore_query", "query_weight", "rescore_query_weight",
        }
        if rqextra:
            raise _err(f"rescore query options {sorted(rqextra)}")
        rkind, rbody = _single(rq["rescore_query"], "rescore_query")
        if rkind != "match":
            raise _err(f"rescore_query type {rkind!r}")
        rterms = index.analyze_text(_match_text(rbody, "rescore"))
        terms = index.analyze_text(_match_text(q, "rescore"))
        if not terms or not rterms:
            raise _err("rescore query analyzing to no terms")
        from pycasselastic_spark.operators.search_probes import bm25_rescore

        return bm25_rescore(
            index, terms, rterms,
            window_size=int(rs.get("window_size", 10)),
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_weight=float(rq.get("rescore_query_weight", 1.0)),
            k=size,
        )

    if "aggs" in body:
        agg_name, agg = _single(body["aggs"], "aggs")
        # terms is the agg scope: an analyzed term list under match,
        # a derived hit-id relation under the other query types
        # (hits_relation accepts both downstream)
        terms = _agg_scope(index, qtype, q)
        # ES ``filter`` aggregation: narrow the scope with a
        # filter-context clause WITHOUT touching the query, then run
        # the sub-aggregation over the intersection — the dashboard
        # staple ("hits for X; stats over the paid subset"). Nesting
        # composes (filter inside filter), hence the loop.
        if isinstance(agg, dict) and set(agg) == {"global", "aggs"}:
            # ES ``global`` scope: the sub-aggregation runs over ALL
            # live docs, ignoring the query — the "X among hits vs X
            # overall" comparison every faceted UI draws
            if agg["global"] != {}:
                raise _err(
                    f"global agg options {sorted(agg['global'])}"
                )
            terms = _agg_scope(index, "match_all", {})
            _gname, agg = _single(agg["aggs"], "global sub-aggregation")
        while isinstance(agg, dict) and set(agg) == {"filter", "aggs"}:
            from pycasselastic_spark.operators.search_hybrid import (
                filtered_ids,
            )

            preds = _filter_predicates([agg["filter"]])
            base = (
                terms
                if not isinstance(terms, list)
                else index.live_postings_for(terms)
                .select(index.id_col)
                .distinct()
            )
            terms = base.join(filtered_ids(index, preds),
                              index.id_col, "semi")
            _fname, agg = _single(agg["aggs"], "filter sub-aggregation")
        # metric/histogram aggregations run on STORED doc-values — no
        # docs frame needed; the terms facet still fetches its field
        # from the docs frame (any column, not just stored ones)
        if set(agg) == {"stats"}:
            return search_stats_agg(index, terms, agg["stats"]["field"])
        if set(agg) == {"extended_stats"}:
            spec = agg["extended_stats"]
            if set(spec) != {"field"}:
                raise _err(
                    f"extended_stats options "
                    f"{sorted(set(spec) - {'field'})}"
                )
            from pycasselastic_spark.operators.search_ext import (
                search_extended_stats_agg,
            )

            return search_extended_stats_agg(index, terms, spec["field"])
        if set(agg) == {"weighted_avg"}:
            spec = agg["weighted_avg"]
            if set(spec) != {"value", "weight"}:
                raise _err(
                    f"weighted_avg options "
                    f"{sorted(set(spec) - {'value', 'weight'})}"
                )
            for part in ("value", "weight"):
                if set(spec[part]) != {"field"}:
                    raise _err(
                        f"weighted_avg {part} options "
                        f"{sorted(set(spec[part]) - {'field'})}"
                    )
            from pycasselastic_spark.operators.search_compose import (
                search_weighted_avg_agg,
            )

            return search_weighted_avg_agg(
                index, terms,
                spec["value"]["field"], spec["weight"]["field"],
            )
        if set(agg) == {"median_absolute_deviation"}:
            spec = agg["median_absolute_deviation"]
            if set(spec) != {"field"}:
                # compression is the t-digest dial — this engine is
                # exact, accepting it would imply an approximation
                raise _err(
                    f"median_absolute_deviation options "
                    f"{sorted(set(spec) - {'field'})}"
                )
            from pycasselastic_spark.operators.search_compose import (
                search_mad_agg,
            )

            return search_mad_agg(index, terms, spec["field"])
        if set(agg) == {"rare_terms"}:
            spec = agg["rare_terms"]
            extra = set(spec) - {"field", "max_doc_count"}
            if extra:
                raise _err(f"rare_terms options {sorted(extra)}")
            from pycasselastic_spark.operators.search_ext import (
                search_rare_terms_agg,
            )

            return search_rare_terms_agg(
                index, terms, spec["field"],
                max_doc_count=int(spec.get("max_doc_count", 1)),
            )
        for skind in ("significant_terms", "significant_text"):
            if set(agg) == {skind}:
                spec = agg[skind]
                known = {
                    "field", "size", "min_doc_count",
                    "jlh", "chi_square", "percentage",
                }
                extra = set(spec) - known
                if extra:
                    raise _err(f"{skind} options {sorted(extra)}")
                if not isinstance(terms, list):
                    # the operators exclude the QUERY TERMS from the
                    # scored set — a derived hit relation has no term
                    # list to exclude
                    raise _err(
                        f"{skind} under a non-match query (the "
                        "significance scorers need the match terms)"
                    )
                if "field" in spec:
                    _check_text_field(index, str(spec["field"]), skind)
                picked = [h for h in ("jlh", "chi_square", "percentage")
                          if h in spec]
                if len(picked) > 1:
                    raise _err(f"{skind} with multiple heuristics {picked}")
                heuristic = picked[0] if picked else "jlh"
                if picked:
                    hopts = dict(spec[picked[0]] or {})
                    if heuristic == "chi_square":
                        # the implemented contingency is the out-set
                        # (background_is_superset=true) with negatives
                        # excluded; other combos raise by name
                        if bool(hopts.pop("include_negatives", False)):
                            raise _err(
                                "chi_square include_negatives=true"
                            )
                        if not bool(
                            hopts.pop("background_is_superset", True)
                        ):
                            raise _err(
                                "chi_square background_is_superset=false"
                            )
                    if hopts:
                        raise _err(
                            f"{heuristic} options {sorted(hopts)}"
                        )
                from pycasselastic_spark.operators.search_ext import (
                    significant_text,
                )

                return significant_text(
                    index, terms,
                    m=int(spec.get("size", 10)),
                    min_fg_df=int(spec.get("min_doc_count", 2)),
                    heuristic=heuristic,
                )
        for m in ("avg", "sum", "min", "max", "value_count", "missing"):
            if set(agg) == {m}:
                if set(agg[m]) != {"field"}:
                    raise _err(
                        f"{m} aggregation options "
                        f"{sorted(set(agg[m]) - {'field'})}"
                    )
                from pycasselastic_spark.operators.search_ext import (
                    search_metric_agg,
                )

                return search_metric_agg(index, terms, agg[m]["field"], m)
        if set(agg) == {"histogram"}:
            hspec = agg["histogram"]
            hextra = set(hspec) - {
                "field", "interval", "offset", "min_doc_count",
            }
            if hextra:
                raise _err(f"histogram options {sorted(hextra)}")
            return search_histogram_agg(
                index, terms, hspec["field"],
                float(hspec["interval"]),
                offset=float(hspec.get("offset", 0.0)),
                min_doc_count=int(hspec.get("min_doc_count", 1)),
            )
        if set(agg) == {"boxplot"}:
            spec = agg["boxplot"]
            extra = set(spec) - {"field"}
            if extra:
                # compression is the t-digest dial; exact needs none
                raise _err(f"boxplot options {sorted(extra)}")
            from pycasselastic_spark.operators.search_compose import (
                search_boxplot_agg,
            )

            return search_boxplot_agg(index, terms, spec["field"])
        if set(agg) == {"percentiles"}:
            spec = agg["percentiles"]
            extra = set(spec) - {"field", "percents"}
            if extra:
                raise _err(f"percentiles options {sorted(extra)}")
            percents = spec.get("percents", (25, 50, 75, 90))
            if any(float(p) != int(float(p)) for p in percents):
                # int() would silently truncate 99.9 -> 99 and compute
                # a different quantile; raise until fractional percents
                # get a first-class (DOUBLE-keyed) output schema
                raise _err(
                    f"fractional percentiles {sorted(set(map(float, percents)))}"
                )
            return search_percentiles_agg(
                index, terms, spec["field"],
                percents=tuple(int(p) for p in percents),
            )
        if set(agg) == {"percentile_ranks"}:
            spec = agg["percentile_ranks"]
            extra = set(spec) - {"field", "values"}
            if extra:
                raise _err(f"percentile_ranks options {sorted(extra)}")
            from pycasselastic_spark.operators.search_compose import (
                search_percentile_ranks_agg,
            )

            return search_percentile_ranks_agg(
                index, terms, spec["field"], list(spec["values"])
            )
        if set(agg) == {"date_range"}:
            spec = agg["date_range"]
            extra = set(spec) - {"field", "ranges"}
            if extra:
                raise _err(f"date_range options {sorted(extra)}")
            from pycasselastic_spark.operators.search_compose import (
                search_date_range_agg,
            )

            return search_date_range_agg(
                index, terms, spec["field"], list(spec["ranges"])
            )
        if set(agg) == {"cardinality"}:
            if set(agg["cardinality"]) != {"field"}:
                raise _err(
                    "cardinality options "
                    f"{sorted(set(agg['cardinality']) - {'field'})}"
                )
            return search_cardinality_agg(
                index, terms, agg["cardinality"]["field"]
            )
        if set(agg) == {"range"}:
            spec = agg["range"]
            extra = set(spec) - {"field", "ranges"}
            if extra:
                raise _err(f"range agg options {sorted(extra)}")
            return search_range_agg(
                index, terms, spec["field"], list(spec["ranges"])
            )
        if set(agg) == {"sampler", "aggs"}:
            # ES ``sampler``: run the sub-aggregation over only the
            # TOP-SCORING shard_size hits — the "what do the best
            # matches look like" scope. ES's per-shard sample is
            # nondeterministic across topologies; this engine's one
            # logical shard makes it the exact global top-N by
            # (score, id), strictly more reproducible.
            spec = agg["sampler"]
            if set(spec) - {"shard_size"}:
                raise _err(
                    f"sampler options {sorted(set(spec) - {'shard_size'})}"
                )
            if not isinstance(terms, list):
                # the sample ranks by SCORE — an id-only hit set has
                # none (same law as top_hits)
                raise _err(f"sampler under query type {qtype!r}")
            _sname, samp_sub = _single(agg["aggs"], "sampler sub-aggregation")
            if set(samp_sub) != {"terms"} or set(samp_sub["terms"]) != {"field"}:
                raise _err(
                    "sampler sub-aggregation (a plain terms facet only)"
                )
            sfield = samp_sub["terms"]["field"]
            if sfield not in index.stored_fields:
                raise _err(
                    f"sampler facet field {sfield!r} without doc-values"
                )
            from pycasselastic_spark.operators.search_index import dv_col

            top = bm25_topk_indexed(
                index, terms, k=int(spec.get("shard_size", 100))
            ).select(index.id_col)
            dv = index.live_docvalues().select(
                F.col(index.id_col), dv_col(sfield)
            )
            return (
                dv.join(F.broadcast(top), index.id_col)
                .filter(dv_col(sfield).isNotNull())
                .groupBy(dv_col(sfield).alias("bucket"))
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .orderBy(F.col("n_docs").desc(), F.col("bucket").asc())
            )
        if set(agg) == {"diversified_sampler", "aggs"}:
            # ES ``diversified_sampler``: the sampler's top-scoring
            # scope with a per-value cap — at most max_docs_per_value
            # docs sharing one value of the diversity field enter the
            # sample (the "don't let one domain dominate" guard).
            # Same one-logical-shard determinism note as sampler.
            spec = agg["diversified_sampler"]
            dextra = set(spec) - {"field", "shard_size",
                                  "max_docs_per_value"}
            if dextra:
                raise _err(
                    f"diversified_sampler options {sorted(dextra)}"
                )
            if "field" not in spec:
                raise _err("diversified_sampler missing field")
            if not isinstance(terms, list):
                raise _err(
                    f"diversified_sampler under query type {qtype!r}"
                )
            divfield = spec["field"]
            _sname, samp_sub = _single(
                agg["aggs"], "diversified_sampler sub-aggregation"
            )
            if (set(samp_sub) != {"terms"}
                    or set(samp_sub["terms"]) != {"field"}):
                raise _err(
                    "diversified_sampler sub-aggregation (a plain "
                    "terms facet only)"
                )
            sfield = samp_sub["terms"]["field"]
            for f in (divfield, sfield):
                if f not in index.stored_fields:
                    raise _err(
                        f"diversified_sampler field {f!r} without "
                        "doc-values"
                    )
            from pyspark.sql.window import Window

            from pycasselastic_spark.operators.search_index import dv_col
            from pycasselastic_spark.operators.search_probes import (
                _bm25_scored,
            )

            # scores join the diversity values; the per-value cap is
            # a window PARTITIONED by the diversity value (bounded
            # state per key, no global window); docs missing the
            # diversity value carry no value to de-duplicate on and
            # are excluded from the sample (documented)
            scored = _bm25_scored(index, terms, 1.2, 0.75)
            divdv = index.live_docvalues().select(
                F.col(index.id_col), dv_col(divfield).alias("_div"),
                dv_col(sfield).alias("_facet"),
            )
            joined = (
                divdv.join(scored, index.id_col)
                .filter(F.col("_div").isNotNull())
            )
            w = Window.partitionBy("_div").orderBy(
                F.col("score_q20").desc(), F.col(index.id_col).asc()
            )
            sample = (
                joined.withColumn("_rn", F.row_number().over(w))
                .filter(
                    F.col("_rn")
                    <= int(spec.get("max_docs_per_value", 1))
                )
                .orderBy(
                    F.col("score_q20").desc(), F.col(index.id_col).asc()
                )
                .limit(int(spec.get("shard_size", 100)))
            )
            return (
                sample.filter(F.col("_facet").isNotNull())
                .groupBy(F.col("_facet").alias("bucket"))
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .orderBy(F.col("n_docs").desc(), F.col("bucket").asc())
            )
        if set(agg) == {"string_stats"}:
            spec = agg["string_stats"]
            if set(spec) - {"field"}:
                raise _err(
                    f"string_stats options {sorted(set(spec) - {'field'})}"
                )
            from pycasselastic_spark.operators.search_ext import (
                search_string_stats_agg,
            )

            return search_string_stats_agg(index, terms, spec["field"])
        if set(agg) == {"matrix_stats"}:
            spec = agg["matrix_stats"]
            if set(spec) - {"fields"}:
                raise _err(
                    f"matrix_stats options {sorted(set(spec) - {'fields'})}"
                )
            from pycasselastic_spark.operators.search_ext import (
                search_matrix_stats_agg,
            )

            return search_matrix_stats_agg(
                index, terms, list(spec["fields"])
            )
        if set(agg) == {"t_test"}:
            spec = agg["t_test"]
            textra = set(spec) - {"a", "b", "type"}
            if textra:
                raise _err(f"t_test options {sorted(textra)}")
            pops = {}
            for pk in ("a", "b"):
                if pk not in spec:
                    raise _err(f"t_test missing population {pk!r}")
                pspec = spec[pk]
                if set(pspec) != {"field", "filter"}:
                    raise _err(
                        f"t_test {pk} options {sorted(set(pspec))} "
                        "(the two-filter form needs field + filter; "
                        "the filterless paired form needs a pairing "
                        "key, not a doc-values law)"
                    )
                pops[pk] = (
                    pspec["field"],
                    _filter_predicates([pspec["filter"]]),
                )
            if pops["a"][0] != pops["b"][0]:
                raise _err(
                    f"t_test fields differ ({pops['a'][0]!r} vs "
                    f"{pops['b'][0]!r}) — the two-filter form compares "
                    "ONE metric across two populations"
                )
            from pycasselastic_spark.operators.search_ext import (
                search_t_test_agg,
            )

            return search_t_test_agg(
                index, terms, pops["a"][0],
                pops["a"][1], pops["b"][1],
                test_type=str(spec.get("type", "heteroscedastic")),
            )
        if set(agg) == {"filters"}:
            spec = agg["filters"]
            if set(spec) != {"filters"}:
                # other_bucket / keyed-array forms are not dispatched
                raise _err(
                    f"filters agg options {sorted(set(spec) - {'filters'})}"
                )
            if not isinstance(spec["filters"], dict):
                raise _err(
                    "filters agg with anonymous (array) filters "
                    "(supported: the named-bucket object form)"
                )
            from pycasselastic_spark.operators.search_compose import (
                search_filters_agg,
            )

            named = [
                (name, _filter_predicates([clause]))
                for name, clause in spec["filters"].items()
            ]
            return search_filters_agg(index, terms, named)
        if set(agg) == {"adjacency_matrix"}:
            spec = agg["adjacency_matrix"]
            extra = set(spec) - {"filters", "separator"}
            if extra:
                raise _err(f"adjacency_matrix options {sorted(extra)}")
            if not isinstance(spec["filters"], dict):
                raise _err(
                    "adjacency_matrix with anonymous (array) filters"
                )
            from pycasselastic_spark.operators.search_compose import (
                search_adjacency_matrix_agg,
            )

            named = [
                (name, _filter_predicates([clause]))
                for name, clause in spec["filters"].items()
            ]
            return search_adjacency_matrix_agg(
                index, terms, named,
                separator=str(spec.get("separator", "&")),
            )
        if set(agg) in ({"date_histogram"}, {"date_histogram", "aggs"}):
            spec = agg["date_histogram"]
            extra = set(spec) - {
                "field", "calendar_interval", "fixed_interval",
                "min_doc_count", "extended_bounds",
            }
            if extra:
                raise _err(f"date_histogram options {sorted(extra)}")
            eb = spec.get("extended_bounds")
            if eb is not None:
                if set(eb) != {"min", "max"}:
                    raise _err(
                        f"extended_bounds keys {sorted(set(eb))} "
                        "(expected min/max)"
                    )
                eb = (eb["min"], eb["max"])
            buckets = search_date_histogram_agg(
                index, terms, spec["field"],
                calendar_interval=spec.get("calendar_interval"),
                fixed_interval=spec.get("fixed_interval"),
                min_doc_count=int(spec.get("min_doc_count", 1)),
                extended_bounds=eb,
            )
            sub = agg.get("aggs")
            if sub:
                # parent PIPELINE aggregations riding the histogram:
                # cumulative_sum / derivative over the response-sized
                # bucket relation (ES caps it at search.max_buckets)
                from pycasselastic_spark.operators.search_compose import (
                    apply_bucket_pipelines,
                )

                scalar_kinds = (
                    "avg_bucket", "sum_bucket", "min_bucket",
                    "max_bucket", "stats_bucket",
                )
                pipelines = []
                rate_cols: list[tuple[str, int]] = []
                norm_cols: list[tuple[str, str]] = []
                for pname, pbody in sub.items():
                    pkind, pspec = _single(
                        pbody, f"date_histogram sub-aggregation {pname!r}"
                    )
                    if pkind in scalar_kinds:
                        # a sibling scalar reduction IS the response —
                        # it can't ride next to per-bucket columns in
                        # one frame, so it must be the only sub-agg
                        if len(sub) != 1:
                            raise _err(
                                f"{pkind} beside other sub-aggregations "
                                "(a scalar reduction is its own response)"
                            )
                        if set(pspec) != {"buckets_path"}:
                            raise _err(
                                f"{pkind} options "
                                f"{sorted(set(pspec) - {'buckets_path'})}"
                            )
                        if pspec["buckets_path"] != "_count":
                            raise _err(
                                f"{pkind} buckets_path "
                                f"{pspec['buckets_path']!r} "
                                "(supported: _count)"
                            )
                        from pycasselastic_spark.operators.search_compose import (  # noqa: E501
                            bucket_scalar_agg,
                        )

                        return bucket_scalar_agg(buckets, pkind, "n_docs")
                    if pkind == "serial_diff":
                        pextra = set(pspec) - {"buckets_path", "lag"}
                        if pextra:
                            raise _err(
                                f"serial_diff options {sorted(pextra)}"
                            )
                        if pspec["buckets_path"] != "_count":
                            raise _err(
                                f"serial_diff buckets_path "
                                f"{pspec['buckets_path']!r} "
                                "(supported: _count)"
                            )
                        lag = int(pspec.get("lag", 1))
                        if lag < 1:
                            raise _err(f"serial_diff lag {lag!r}")
                        pipelines.append(
                            (pname, ("serial_diff", lag), "n_docs")
                        )
                        continue
                    if pkind == "rate":
                        # ES rate agg (7.10): the bucket count scaled
                        # to a time unit — "requests per hour" off a
                        # 12h histogram. Fixed-interval parents only:
                        # a calendar bucket has no constant width to
                        # scale by (ES restricts the calendar case to
                        # matching calendar units; raise by name)
                        pextra = set(pspec) - {"unit"}
                        if pextra:
                            raise _err(f"rate options {sorted(pextra)}")
                        if not spec.get("fixed_interval"):
                            raise _err(
                                "rate under a calendar_interval parent "
                                "(fixed_interval parents only)"
                            )
                        runit = str(pspec.get("unit", "hour"))
                        unit_s = {
                            "second": 1, "minute": 60, "hour": 3600,
                            "day": 86400, "week": 604800,
                        }.get(runit)
                        if unit_s is None:
                            raise _err(
                                f"rate unit {runit!r} (fixed units "
                                "second/minute/hour/day/week)"
                            )
                        rate_cols.append((pname, unit_s))
                        continue
                    if pkind == "moving_fn":
                        pextra = set(pspec) - {
                            "buckets_path", "window", "script", "shift",
                        }
                        if pextra:
                            raise _err(
                                f"moving_fn options {sorted(pextra)}"
                            )
                        missing = {"buckets_path", "window",
                                   "script"} - set(pspec)
                        if missing:
                            raise _err(
                                f"moving_fn missing {sorted(missing)}"
                            )
                        if pspec["buckets_path"] != "_count":
                            raise _err(
                                f"moving_fn buckets_path "
                                f"{pspec['buckets_path']!r} "
                                "(supported: _count)"
                            )
                        m = re.fullmatch(
                            r"\s*MovingFunctions\.(\w+)\(values\)\s*",
                            str(pspec.get("script", "")),
                        )
                        if not m or m.group(1) not in (
                            "unweightedAvg", "sum", "min", "max",
                        ):
                            # ewma/holt/holtWinters/stdDev and custom
                            # Painless raise by name — the four exact
                            # reductions are the SQL-expressible set
                            raise _err(
                                "moving_fn script "
                                f"{pspec.get('script')!r} (supported: "
                                "MovingFunctions.unweightedAvg/sum/"
                                "min/max over 'values')"
                            )
                        mwin = int(pspec["window"])
                        if mwin < 1:
                            raise _err(f"moving_fn window {mwin!r}")
                        mshift = int(pspec.get("shift", 0))
                        pipelines.append((
                            pname,
                            ("moving_fn", m.group(1), mwin, mshift),
                            "n_docs",
                        ))
                        continue
                    if pkind == "moving_avg":
                        # the legacy (pre-ES8) smoother: only the
                        # 'simple' model is an exact reduction — it is
                        # moving_fn unweightedAvg anchored to INCLUDE
                        # the current bucket (shift 1)
                        pextra = set(pspec) - {
                            "buckets_path", "window", "model",
                        }
                        if pextra:
                            raise _err(
                                f"moving_avg options {sorted(pextra)}"
                            )
                        if "buckets_path" not in pspec:
                            raise _err("moving_avg missing buckets_path")
                        if pspec["buckets_path"] != "_count":
                            raise _err(
                                f"moving_avg buckets_path "
                                f"{pspec['buckets_path']!r} "
                                "(supported: _count)"
                            )
                        model = str(pspec.get("model", "simple"))
                        if model != "simple":
                            raise _err(
                                f"moving_avg model {model!r} (simple "
                                "only — ewma/holt fit state, not an "
                                "exact reduction)"
                            )
                        mwin = int(pspec.get("window", 5))
                        if mwin < 1:
                            raise _err(f"moving_avg window {mwin!r}")
                        pipelines.append((
                            pname,
                            ("moving_fn", "unweightedAvg", mwin, 1),
                            "n_docs",
                        ))
                        continue
                    if pkind == "normalize":
                        # ES normalize (7.9): rescale the per-bucket
                        # count against the WHOLE bucket set
                        pextra = set(pspec) - {"buckets_path", "method"}
                        if pextra:
                            raise _err(
                                f"normalize options {sorted(pextra)}"
                            )
                        if pspec.get("buckets_path") != "_count":
                            raise _err(
                                f"normalize buckets_path "
                                f"{pspec.get('buckets_path')!r} "
                                "(supported: _count)"
                            )
                        if "method" not in pspec:
                            raise _err("normalize missing method")
                        norm_cols.append((pname, str(pspec["method"])))
                        continue
                    if pkind not in ("cumulative_sum", "derivative"):
                        raise _err(
                            f"date_histogram sub-aggregation {pkind!r}"
                        )
                    if set(pspec) != {"buckets_path"}:
                        raise _err(
                            f"{pkind} options "
                            f"{sorted(set(pspec) - {'buckets_path'})}"
                        )
                    if pspec["buckets_path"] != "_count":
                        raise _err(
                            f"{pkind} buckets_path "
                            f"{pspec['buckets_path']!r} (supported: _count)"
                        )
                    pipelines.append((pname, pkind, "n_docs"))
                if pipelines:
                    buckets = apply_bucket_pipelines(buckets, pipelines)
                if rate_cols:
                    from pycasselastic_spark.operators.search_compose import (  # noqa: E501
                        _parse_fixed_interval,
                    )

                    interval_s = _parse_fixed_interval(
                        str(spec["fixed_interval"])
                    )
                    for pname, unit_s in rate_cols:
                        # one row-local expression; the oracle replays
                        # FLOOR(n_docs * (unit / interval) * Q20) with
                        # the identical grouping
                        buckets = buckets.withColumn(
                            pname,
                            F.floor(
                                F.col("n_docs")
                                * (F.lit(float(unit_s))
                                   / F.lit(float(interval_s)))
                                * F.lit(float(1 << 20))
                            ).cast("long"),
                        )
                    buckets = buckets.orderBy(F.col("bucket").asc())
                if norm_cols:
                    from pycasselastic_spark.operators.search_compose import (  # noqa: E501
                        apply_normalize,
                    )

                    for pname, method in norm_cols:
                        buckets = apply_normalize(
                            buckets, "n_docs", method, pname
                        )
            return buckets
        if set(agg) == {"auto_date_histogram"}:
            spec = agg["auto_date_histogram"]
            aextra = set(spec) - {"field", "buckets"}
            if aextra:
                raise _err(f"auto_date_histogram options {sorted(aextra)}")
            from pycasselastic_spark.operators.search_compose import (
                search_auto_date_histogram_agg,
            )

            return search_auto_date_histogram_agg(
                index, terms, spec["field"],
                buckets=int(spec.get("buckets", 10)),
            )
        if set(agg) == {"multi_terms"}:
            spec = agg["multi_terms"]
            mextra = set(spec) - {"terms", "size"}
            if mextra:
                raise _err(f"multi_terms options {sorted(mextra)}")
            mfields = []
            for t in spec["terms"]:
                if set(t) != {"field"}:
                    raise _err(
                        f"multi_terms term options "
                        f"{sorted(set(t) - {'field'})}"
                    )
                mfields.append(t["field"])
            from pycasselastic_spark.operators.search_ext import (
                search_multi_terms_agg,
            )

            return search_multi_terms_agg(
                index, terms, mfields, k=int(spec.get("size", size))
            )
        if set(agg) - {"terms", "aggs"}:
            raise _err(f"aggregation {sorted(set(agg) - {'terms'})}")
        field = agg["terms"]["field"]
        sub = agg.get("aggs")
        if sub and any(
            isinstance(s, dict) and set(s) & {
                "bucket_selector", "bucket_sort", "bucket_script",
            }
            for s in sub.values()
        ):
            # sibling PIPELINE aggregations under terms: exactly one
            # metric sub-agg (stats) defines the bucket columns, then
            # bucket_selector filters / bucket_sort re-pages the
            # response-sized bucket relation
            from pycasselastic_spark.operators.search_compose import (
                apply_bucket_selector,
                apply_bucket_sort,
            )

            selector = sorter = None
            metric_name = None
            scripts: list[tuple[str, dict]] = []
            for pname, pbody in sub.items():
                pkind, pspec = _single(
                    pbody, f"terms sub-aggregation {pname!r}"
                )
                if pkind == "bucket_selector":
                    if selector is not None:
                        raise _err("multiple bucket_selector entries")
                    selector = pspec
                elif pkind == "bucket_sort":
                    if sorter is not None:
                        raise _err("multiple bucket_sort entries")
                    sorter = pspec
                elif pkind == "bucket_script":
                    # a computed per-bucket metric column (ratio /
                    # percentage dashboards); applied before
                    # selector/sort so they could page on raw metrics
                    scripts.append((pname, pspec))
                elif pkind == "stats":
                    if metric_name is not None:
                        raise _err("multiple metric sub-aggregations")
                    metric_name = pname
                    metric_field = pspec["field"]
                else:
                    raise _err(
                        f"terms sub-aggregation {pkind!r} alongside "
                        "pipeline aggregations (supported: stats)"
                    )
            if metric_name is None:
                raise _err(
                    "bucket pipeline aggregations without a stats "
                    "sub-aggregation (buckets_path needs metric columns)"
                )
            textra = set(agg["terms"]) - {"field"}
            if textra:
                raise _err(
                    f"terms options {sorted(textra)} with pipeline "
                    "sub-aggregations"
                )

            def _path_col(path: str, *, selector_ctx: bool) -> str:
                if path == "_count":
                    return "n_docs"
                head, _, leaf = str(path).partition(".")
                if head != metric_name:
                    raise _err(
                        f"buckets_path head {head!r} "
                        f"(known sub-aggregations: {metric_name!r})"
                    )
                # ES stats.count counts metric VALUES (NULLs excluded),
                # so '<stats>.count' reads val_count, not the bucket
                # doc count n_docs ('_count' above reads that)
                cols = {
                    "sum": "sum_val", "min": "min_val",
                    "max": "max_val", "count": "val_count",
                }
                if leaf == "avg":
                    if selector_ctx:
                        # avg is stored Q20-quantized; comparing it to
                        # a user literal would silently be off by 2^20
                        raise _err(
                            "bucket_selector over the avg metric "
                            "(Q20-quantized — compare sum/min/max/_count)"
                        )
                    return "avg_q20"
                if leaf == "sum" and selector_ctx:
                    # a FRACTIONAL metric's sum is ALSO stored in Q20
                    # units (search_facet_metric_agg's order-independent
                    # sum law) — a literal comparison would silently be
                    # off by 2^20; integral sums stay exact
                    mtype = dict(
                        index.live_docvalues().dtypes
                    ).get(metric_field)
                    if mtype not in (
                        "tinyint", "smallint", "int", "bigint",
                    ):
                        raise _err(
                            "bucket_selector over a fractional metric's "
                            "sum (Q20-quantized — compare min/max/_count)"
                        )
                if leaf not in cols:
                    raise _err(f"buckets_path leaf {leaf!r}")
                return cols[leaf]

            buckets = search_facet_metric_agg(
                index, terms, field, metric_field, order_by="n_docs",
                include_value_count=True,
            )
            for pname, pspec in scripts:
                if set(pspec) != {"buckets_path", "script"}:
                    raise _err(
                        "bucket_script options "
                        f"{sorted(set(pspec) - {'buckets_path', 'script'})}"
                    )
                from pycasselastic_spark.operators.search_compose import (
                    apply_bucket_script,
                )

                # avg/fractional-sum paths are Q20-quantized — mixing
                # them into raw arithmetic would silently be off by
                # 2^20, so bucket_script resolves paths under the
                # selector law (exact integer columns only)
                spaths = {
                    var: _path_col(p, selector_ctx=True)
                    for var, p in pspec["buckets_path"].items()
                }
                buckets = apply_bucket_script(
                    buckets, spaths, pspec["script"], pname
                )
            if selector is not None:
                if set(selector) != {"buckets_path", "script"}:
                    raise _err(
                        "bucket_selector options "
                        f"{sorted(set(selector) - {'buckets_path', 'script'})}"
                    )
                paths = {
                    var: _path_col(p, selector_ctx=True)
                    for var, p in selector["buckets_path"].items()
                }
                buckets = apply_bucket_selector(
                    buckets, paths, selector["script"]
                )
            if sorter is not None:
                sextra = set(sorter) - {"sort", "size", "from"}
                if sextra:
                    raise _err(f"bucket_sort options {sorted(sextra)}")
                sort_cols = []
                for entry in sorter.get("sort", []):
                    p, odir = _single(entry, "bucket_sort sort entry")
                    if isinstance(odir, dict):
                        if set(odir) != {"order"}:
                            raise _err(
                                f"bucket_sort sort options "
                                f"{sorted(set(odir) - {'order'})}"
                            )
                        odir = odir["order"]
                    sort_cols.append(
                        (_path_col(p, selector_ctx=False), str(odir))
                    )
                buckets = apply_bucket_sort(
                    buckets, sort_cols,
                    size=(int(sorter["size"]) if "size" in sorter
                          else None),
                    from_=int(sorter.get("from", 0)),
                )
            else:
                buckets = buckets.orderBy(F.col("bucket").asc())
            # val_count exists only for buckets_path resolution; the
            # response schema (bucket, n_docs, min/max/sum/avg) is
            # pinned by the oracles
            return buckets.drop("val_count")
        if sub:
            _sn, s = _single(sub, "sub-aggregation")
            if set(s) == {"stats"}:
                # terms + metric sub-agg runs entirely on STORED
                # doc-values (both fields); ES bucket `order` may name
                # the sub-agg's value
                order = agg["terms"].get("order")
                order_by = "n_docs"
                if order is not None:
                    okey, odir = _single(order, "terms order")
                    if odir != "desc":
                        raise _err(f"terms order direction {odir!r}")
                    order_by = {
                        "_count": "n_docs", "avg": "avg_q20",
                        "sum": "sum_val", "min": "min_val",
                        "max": "max_val",
                    }.get(okey)
                    if order_by is None:
                        raise _err(f"terms order key {okey!r}")
                extra = set(agg["terms"]) - {"field", "order"}
                if extra:
                    raise _err(f"terms options {sorted(extra)}")
                return search_facet_metric_agg(
                    index, terms, field, s["stats"]["field"],
                    order_by=order_by,
                )
            if set(s) == {"top_metrics"}:
                # terms > top_metrics: per bucket, the metric carried
                # by the doc atop a sort ("per source: the n_chars of
                # the newest doc"); size=1 only — the multi-row page
                # is top_hits' job
                tspec = s["top_metrics"]
                textra = set(tspec) - {"metrics", "sort", "size"}
                if textra:
                    raise _err(f"top_metrics options {sorted(textra)}")
                tmissing = {"metrics", "sort"} - set(tspec)
                if tmissing:
                    raise _err(f"top_metrics missing {sorted(tmissing)}")
                if int(tspec.get("size", 1)) != 1:
                    raise _err(
                        "top_metrics size > 1 (one row per bucket — "
                        "use top_hits for the page)"
                    )
                mspec = tspec["metrics"]
                if isinstance(mspec, list):
                    if len(mspec) != 1:
                        raise _err("top_metrics with multiple metrics")
                    mspec = mspec[0]
                if set(mspec) != {"field"}:
                    raise _err(
                        f"top_metrics metric options "
                        f"{sorted(set(mspec) - {'field'})}"
                    )
                sspec = tspec["sort"]
                if isinstance(sspec, list):
                    if len(sspec) != 1:
                        raise _err("top_metrics with multiple sorts")
                    sspec = sspec[0]
                sfield, sdir = _single(sspec, "top_metrics sort")
                if isinstance(sdir, dict):
                    if set(sdir) != {"order"}:
                        raise _err(
                            f"top_metrics sort options "
                            f"{sorted(set(sdir) - {'order'})}"
                        )
                    sdir = sdir["order"]
                if str(sdir) not in ("asc", "desc"):
                    raise _err(f"top_metrics sort order {sdir!r}")
                textra2 = set(agg["terms"]) - {"field"}
                if textra2:
                    raise _err(
                        f"terms options {sorted(textra2)} with a "
                        "top_metrics sub-agg"
                    )
                from pycasselastic_spark.operators.search_compose import (  # noqa: E501
                    search_facet_top_metrics,
                )

                return search_facet_top_metrics(
                    index, terms, field, mspec["field"], sfield,
                    ascending=(str(sdir) == "asc"),
                )
            if set(s) == {"date_histogram"}:
                # terms > date_histogram: the two-level time-series
                # bucket rides one two-key reduction
                dspec = s["date_histogram"]
                dextra = set(dspec) - {"field", "calendar_interval"}
                if dextra:
                    raise _err(
                        f"date_histogram sub-agg options {sorted(dextra)}"
                    )
                textra = set(agg["terms"]) - {"field"}
                if textra:
                    raise _err(
                        f"terms options {sorted(textra)} with a "
                        "date_histogram sub-agg"
                    )
                return search_facet_date_histogram_agg(
                    index, terms, field,
                    dspec["field"], dspec["calendar_interval"],
                )
            if set(s) != {"top_hits"}:
                raise _err(f"sub-aggregation {sorted(s)}")
            if docs is None:
                raise _err(
                    "top_hits sub-aggregation without a docs frame "
                    "(stored-field fetch)"
                )
            if not isinstance(terms, list):
                # top_hits ranks by SCORE — an id-only hit set has
                # none; the other aggs only need membership
                raise _err(f"top_hits under query type {qtype!r}")
            return top_hits_by_facet(
                index, docs, terms, field,
                hits_per_bucket=int(s["top_hits"].get("size", 3)),
            )
        if docs is None:
            raise _err("terms aggs without a docs frame (stored-field fetch)")
        textra = set(agg["terms"]) - {
            "field", "size", "missing", "include", "exclude",
        }
        if textra:
            raise _err(f"terms options {sorted(textra)}")
        inc, exc = agg["terms"].get("include"), agg["terms"].get("exclude")
        for r in (inc, exc):
            if r is not None and not isinstance(r, str):
                # the partitioned expressions form ({"partition": ..})
                raise _err(f"terms include/exclude form {r!r}")
        return search_facets(
            index, docs, terms, field,
            k=int(agg["terms"].get("size", size)),
            missing=agg["terms"].get("missing"),
            include=inc,
            exclude=exc,
        )

    if "collapse" in body:
        if docs is None:
            raise _err("collapse without a docs frame (stored-field fetch)")
        if qtype != "match":
            raise _err(f"collapse under query type {qtype!r}")
        return bm25_collapse(
            index, docs, index.analyze_text(_match_text(q, "collapse")),
            body["collapse"]["field"], k=size,
        )

    if "highlight" in body:
        # ES's response shape: the RANKED hits, each carrying its
        # snippet — the scored probe joins the candidate-bounded
        # stored-field fetch on the id
        if docs is None:
            raise _err("highlight without a docs frame (stored-field fetch)")
        if set(body) - {"highlight", "query", "size"}:
            raise _err(
                "highlight combined with "
                f"{sorted(set(body) - {'highlight', 'query', 'size'})}"
            )
        if qtype != "match":
            raise _err(f"highlight under query type {qtype!r}")
        hspec = body["highlight"]
        if set(hspec) != {"fields"}:
            raise _err(
                f"highlight options {sorted(set(hspec) - {'fields'})}"
            )
        field, fopts = _single(hspec["fields"], "highlight field")
        if fopts:
            # fragment_size etc. are char-based in ES; the snippet
            # window here is token-based — raise rather than silently
            # reinterpret units
            raise _err(f"highlight field options {sorted(fopts)}")
        from pycasselastic_spark.operators.search_ext import (
            highlight_snippets,
        )

        terms = index.analyze_text(_match_text(q, "highlight"))
        id_col = index.id_col
        hits = bm25_topk_indexed(index, terms, k=size)
        snips = highlight_snippets(index, docs, field, terms).select(
            F.col(id_col), "snippet"
        )
        return (
            hits.join(snips, id_col)
            .orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
            .limit(size)
        )

    if qtype == "match":
        if isinstance(q, dict) and len(q) == 1:
            field, spec = next(iter(q.items()))
        else:
            raise _err(f"match body {q!r}")
        if isinstance(spec, dict):
            text = spec["query"]
            terms = index.analyze_text(str(text))
            extra = set(spec) - {
                "query", "minimum_should_match", "fuzziness", "operator",
            }
            if extra:
                raise _err(f"match options {sorted(extra)}")
            if "operator" in spec:
                op = str(spec["operator"]).lower()
                if op not in ("or", "and"):
                    raise _err(f"match operator {op!r}")
                if op == "and":
                    # every analyzed term required — the conjunctive
                    # probe; the other dials don't compose with it
                    # (fuzzy has no conjunction, min-match contradicts
                    # it, the cursor isn't threaded), so they raise
                    clash = (set(spec) - {"query", "operator"}) | (
                        {"search_after"} if "search_after" in body else set()
                    )
                    if clash:
                        raise _err(
                            f"match operator=and combined with {sorted(clash)}"
                        )
                    return bm25_topk_conjunctive(index, terms, k=size)
            if "fuzziness" in spec and "minimum_should_match" in spec:
                # the fuzzy probe has no min-match dial — honoring one
                # option while silently dropping the other is exactly
                # the dispatcher's forbidden failure mode
                raise _err(
                    "match with BOTH fuzziness and minimum_should_match"
                )
            if "search_after" in body and (
                "fuzziness" in spec or "minimum_should_match" in spec
            ):
                # neither option threads the (score, id) cursor through
                # its probe yet — returning page one again would
                # silently duplicate/skip results under pagination
                # (round-10 advisor finding)
                raise _err(
                    "search_after combined with match options "
                    f"{sorted(set(spec) - {'query'})}"
                )
            if "fuzziness" in spec:
                return bm25_topk_fuzzy(
                    index, terms, k=size, max_dist=int(spec["fuzziness"])
                )
            if "minimum_should_match" in spec:
                return bm25_topk_min_should_match(
                    index, terms, int(spec["minimum_should_match"]), k=size
                )
        else:
            terms = index.analyze_text(str(spec))
        if "search_after" in body:
            after_score, after_id = body["search_after"]
            return bm25_search_after(
                index, terms, int(after_score), after_id, k=size
            )
        return bm25_topk_indexed(index, terms, k=size)

    if "search_after" in body and qtype != "match_all":
        raise _err(f"search_after under query type {qtype!r}")

    if qtype == "term":
        _field, value = _single(q, "term")
        return bm25_topk_indexed(index, [str(value)], k=size)
    if qtype == "match_all":
        if q:
            raise _err(f"match_all options {sorted(q)}")
        # every LIVE doc, ES's constant 1.0 score -> the id-tiebreak
        # page (the exists/ids contract without a predicate). The
        # doc-values relation holds one row per ingested doc EVEN when
        # its text analyzed to zero terms, so it is the complete
        # live-doc registry; a terms-only index falls back to the
        # forward relation, which cannot see zero-term docs (they hold
        # no postings) — the one documented gap of that layout.
        id_col = index.id_col
        base = (
            index.live_docvalues()
            if index.stored_fields
            else index.live_forward()
        )
        page = base.select(id_col).distinct()
        if "search_after" in body:
            # the index-export loop: match_all pages in id order, the
            # cursor is [last_id] — ES's scroll replacement
            cursor = list(body["search_after"])
            if len(cursor) != 1:
                raise _err(
                    "search_after cursor under match_all (expected "
                    "[last_id])"
                )
            page = page.filter(F.col(id_col) > cursor[0])
        return page.orderBy(F.col(id_col).asc()).limit(size)
    if qtype == "fuzzy":
        # the standalone term-level fuzzy query (match+fuzziness is
        # the analyzed multi-term form; this is the single-term ES
        # ``fuzzy`` query)
        _field, spec = _single(q, "fuzzy")
        if not isinstance(spec, dict):
            spec = {"value": spec}
        extra = set(spec) - {"value", "fuzziness"}
        if extra:
            raise _err(f"fuzzy options {sorted(extra)}")
        return bm25_topk_fuzzy(
            index, [str(spec["value"])], k=size,
            max_dist=int(spec.get("fuzziness", 1)),
        )
    if qtype == "simple_query_string":
        return _dispatch_simple_query_string(index, q, size)
    if qtype == "dis_max":
        extra = set(q) - {"queries", "tie_breaker"}
        if extra:
            raise _err(f"dis_max options {sorted(extra)}")
        clauses = [_clause_terms(index, c) for c in q["queries"]]
        if not all(clauses):
            raise _err("dis_max clause analyzing to no terms")
        return dis_max_search(
            index, clauses, float(q.get("tie_breaker", 0.0)), k=size
        )
    if qtype == "boosting":
        extra = set(q) - {"positive", "negative", "negative_boost"}
        if extra:
            raise _err(f"boosting options {sorted(extra)}")
        pos = _clause_terms(index, q["positive"])
        neg = _clause_terms(index, q["negative"])
        if not pos or not neg:
            raise _err("boosting clause analyzing to no terms")
        return boosting_search(
            index, pos, neg,
            negative_boost=float(q.get("negative_boost", 0.5)), k=size,
        )
    if qtype == "constant_score":
        extra = set(q) - {"filter", "boost"}
        if extra:
            raise _err(f"constant_score options {sorted(extra)}")
        filt = q["filter"]
        fkind, fbody = _single(filt, "constant_score filter")
        # the reference emits the legacy and-list form
        # (pyCassElastic.py:369-383); a bare single clause and the
        # modern bool.must list are accepted too
        if fkind == "and":
            clauses = list(fbody)
        elif fkind == "bool":
            if set(fbody) != {"must"}:
                raise _err(
                    "constant_score bool filter clauses "
                    f"{sorted(set(fbody) - {'must'})}"
                )
            clauses = list(fbody["must"])
        else:
            clauses = [filt]
        return constant_score_search(
            index, _filter_predicates(clauses),
            boost=float(q.get("boost", 1.0)), k=size,
        )
    if qtype == "rank_feature":
        extra = set(q) - {"field", "saturation", "boost"}
        if extra:
            # log / sigmoid are transcendental — not correctly-rounded
            # across engines, so they raise rather than drift
            raise _err(f"rank_feature options {sorted(extra)}")
        sat = q.get("saturation")
        if sat is None or "pivot" not in sat:
            # ES's default pivot is the field's approximate geometric
            # mean — index-statistics-derived, not replayable; require
            # the explicit form
            raise _err(
                "rank_feature without an explicit saturation.pivot"
            )
        if set(sat) != {"pivot"}:
            raise _err(
                f"rank_feature saturation options "
                f"{sorted(set(sat) - {'pivot'})}"
            )
        from pycasselastic_spark.operators.search_compose import (
            rank_feature_search,
        )

        return rank_feature_search(
            index, q["field"], float(sat["pivot"]),
            boost=float(q.get("boost", 1.0)), k=size,
        )
    if qtype == "distance_feature":
        extra = set(q) - {"field", "origin", "pivot", "boost"}
        if extra:
            raise _err(f"distance_feature options {sorted(extra)}")
        for req in ("field", "origin", "pivot"):
            if req not in q:
                raise _err(f"distance_feature without {req!r}")
        origin = q["origin"]
        if isinstance(origin, str):
            import datetime as _dt

            try:
                parsed = _dt.datetime.fromisoformat(
                    origin.replace("Z", "+00:00")
                )
                if parsed.tzinfo is None:
                    # a NAIVE ISO string must not pick up the machine's
                    # local timezone (bit-replayable contract) — ES
                    # treats zoneless dates as UTC and so does this
                    parsed = parsed.replace(tzinfo=_dt.timezone.utc)
                origin_s = int(parsed.timestamp())
            except ValueError:
                raise _err(f"distance_feature origin {origin!r}")
        else:
            origin_s = int(origin)
        from pycasselastic_spark.operators.search_compose import (
            _parse_fixed_interval,
            distance_feature_search,
        )

        return distance_feature_search(
            index, q["field"], origin_s,
            _parse_fixed_interval(q["pivot"]),
            boost=float(q.get("boost", 1.0)), k=size,
        )
    if qtype == "pinned":
        extra = set(q) - {"ids", "organic"}
        if extra:
            # the docs-form (pinned docs across indices) is not
            # dispatched
            raise _err(f"pinned options {sorted(extra)}")
        if "ids" not in q or "organic" not in q:
            raise _err("pinned needs both ids and organic")
        okind, obody = _single(q["organic"], "pinned organic query")
        if okind != "match":
            raise _err(f"pinned organic query type {okind!r}")
        from pycasselastic_spark.operators.search_compose import (
            pinned_search,
        )

        oterms = index.analyze_text(_match_text(obody, "pinned organic"))
        if not oterms:
            raise _err("pinned organic query analyzing to no terms")
        return pinned_search(index, list(q["ids"]), oterms, k=size)
    if qtype == "exists":
        if set(q) != {"field"}:
            raise _err(f"exists options {sorted(set(q) - {'field'})}")
        return search_exists(index, q["field"], k=size)
    if qtype == "range":
        field, spec = _single(q, "range")
        return search_dv_range(index, field, dict(spec), k=size)
    if qtype == "terms":
        field, values = _single(q, "terms")
        if not isinstance(values, (list, tuple)):
            raise _err(f"terms body {values!r} (expected a value list)")
        return search_dv_terms(index, field, list(values), k=size)
    if qtype == "ids":
        if set(q) != {"values"}:
            raise _err(f"ids options {sorted(set(q) - {'values'})}")
        return search_ids(index, list(q["values"]), k=size)
    if qtype == "nested":
        extra = set(q) - {"path", "query"}
        if extra:
            raise _err(f"nested options {sorted(extra)}")
        npath, inner = q["path"], q["query"]
        ikind, ibody = _single(inner, "nested inner query")
        leaves = (
            ibody.get("must", []) if ikind == "bool" else [inner]
        )
        if ikind == "bool" and set(ibody) != {"must"}:
            raise _err(
                f"nested bool clauses {sorted(set(ibody) - {'must'})}"
            )
        conditions = []
        for leaf in leaves:
            lkind, lbody = _single(leaf, "nested leaf")
            field, spec = _single(lbody, f"nested {lkind}")
            if not field.startswith(npath + "."):
                raise _err(
                    f"nested leaf field {field!r} outside path {npath!r}"
                )
            sub = field[len(npath) + 1:]
            if lkind == "term":
                conditions.append((sub, "=", spec))
            elif lkind == "range":
                extra = set(spec) - set(_RANGE_OPS)
                if extra:
                    raise _err(f"nested range options {sorted(extra)}")
                for es_op, op in _RANGE_OPS.items():
                    if es_op in spec:
                        conditions.append((sub, op, spec[es_op]))
            else:
                raise _err(f"nested leaf type {lkind!r}")
        return search_nested(index, npath, conditions, k=size)
    if qtype in ("has_child", "has_parent"):
        # ES join-field (parent/child) queries: the join mapping is
        # the (id, join_name, parent) relation + the declared
        # {parent: children} map, both passed alongside the index
        # (the mapping lives outside the request body in ES too)
        if join_field is None or join_relations is None:
            raise _err(
                f"{qtype} without join_field/join_relations (the ES "
                "join mapping)"
            )
        from pycasselastic_spark.operators.search_join import (
            has_child_search,
            has_parent_search,
        )

        if qtype == "has_child":
            extra = set(q) - {"type", "query", "score_mode"}
            if extra:
                raise _err(f"has_child options {sorted(extra)}")
            if "type" not in q or "query" not in q:
                raise _err("has_child needs type + query")
            ikind, ibody = _single(q["query"], "has_child inner query")
            if ikind != "match":
                raise _err(
                    f"has_child inner query type {ikind!r} (match only)"
                )
            terms = index.analyze_text(
                _match_text(ibody, "has_child")
            )
            if not terms:
                raise _err("has_child query analyzing to no terms")
            return has_child_search(
                index, join_field, join_relations, str(q["type"]),
                terms, score_mode=str(q.get("score_mode", "none")),
                k=size,
            )
        extra = set(q) - {"parent_type", "query", "score"}
        if extra:
            raise _err(f"has_parent options {sorted(extra)}")
        if "parent_type" not in q or "query" not in q:
            raise _err("has_parent needs parent_type + query")
        ikind, ibody = _single(q["query"], "has_parent inner query")
        if ikind != "match":
            raise _err(
                f"has_parent inner query type {ikind!r} (match only)"
            )
        terms = index.analyze_text(_match_text(ibody, "has_parent"))
        if not terms:
            raise _err("has_parent query analyzing to no terms")
        return has_parent_search(
            index, join_field, join_relations, str(q["parent_type"]),
            terms, score=bool(q.get("score", False)), k=size,
        )
    if qtype == "terms_set":
        field, spec = _single(q, "terms_set")
        extra = set(spec) - {"terms", "minimum_should_match_field"}
        if extra:
            # minimum_should_match_script etc. — raise by name rather
            # than fall back to a constant threshold
            raise _err(f"terms_set options {sorted(extra)}")
        if "minimum_should_match_field" not in spec:
            raise _err("terms_set without minimum_should_match_field")
        return terms_set_search(
            index, [str(t) for t in spec["terms"]],
            spec["minimum_should_match_field"], k=size,
        )
    if qtype == "function_score":
        # field_value_factor form: relevance x modifier(factor x field)
        # — the full ES modifier set (log* base 10, ln* natural,
        # sqrt/square/reciprocal/none) with factor and missing
        extra = set(q) - {"query", "field_value_factor"}
        if extra:
            raise _err(
                f"function_score options {sorted(extra)} "
                "(field_value_factor form only)"
            )
        if "field_value_factor" not in q:
            raise _err("function_score without field_value_factor")
        if docs is None:
            raise _err(
                "function_score without a docs frame (field fetch)"
            )
        ikind, ibody = _single(
            q.get("query", {"match": None}), "function_score query"
        )
        if ikind != "match" or ibody is None:
            raise _err(f"function_score under query type {ikind!r}")
        terms = index.analyze_text(_match_text(ibody, "function_score"))
        if not terms:
            raise _err("function_score query analyzing to no terms")
        fvf = q["field_value_factor"]
        fextra = set(fvf) - {"field", "modifier", "factor", "missing"}
        if fextra:
            raise _err(f"field_value_factor options {sorted(fextra)}")
        from pycasselastic_spark.operators.search_ext import (
            bm25_function_score,
        )

        missing = fvf.get("missing")
        return bm25_function_score(
            index, docs, terms, fvf["field"], k=size,
            modifier=str(fvf.get("modifier", "ln1p")),
            factor=float(fvf.get("factor", 1.0)),
            missing=None if missing is None else float(missing),
        )

    if qtype == "multi_match":
        # the multi-field family: every type is a different scoring
        # LAW over per-field indexes (own df/dl/avgdl each — the
        # Lucene per-field model), so each dispatches to its own
        # operator; ``fields`` may carry ES's caret boosts
        # (``title^2``) only where the type's combine law supports
        # exact integer boosts (most_fields)
        extra = set(q) - {"query", "fields", "type", "tie_breaker", "slop"}
        if extra:
            raise _err(f"multi_match options {sorted(extra)}")
        if field_indexes is None:
            raise _err("multi_match without field indexes")
        mtype = str(q.get("type", "best_fields"))
        names, boosts = [], {}
        for spec in q["fields"]:
            name, _, boost = str(spec).partition("^")
            names.append(name)
            if boost:
                if mtype != "most_fields":
                    raise _err(
                        f"multi_match field boost {spec!r} under type "
                        f"{mtype!r} (integer boosts compose exactly only "
                        "in most_fields' sum)"
                    )
                if not boost.isdigit():
                    raise _err(f"non-integer multi_match field boost {spec!r}")
            boosts[name] = int(boost) if boost else 1
        missing = [f for f in names if f not in field_indexes]
        if missing:
            raise _err(f"multi_match fields {missing} without a field index")
        sel = {f: field_indexes[f] for f in names}
        first_an = sel[names[0]].analyzer
        if any(ix.analyzer != first_an for ix in sel.values()):
            # the query analyzes ONCE and probes every field with those
            # tokens; under per-field chains that silently misses (ES
            # analyzes per field) — raise rather than drift
            raise _err(
                "multi_match across fields with DIFFERENT analyzers "
                "(per-field query analysis is not dispatched)"
            )
        terms = sel[names[0]].analyze_text(str(q["query"]))
        if not terms:
            raise _err("multi_match query analyzing to no terms")
        tie = float(q.get("tie_breaker", 0.0))
        if mtype == "best_fields":
            if "slop" in q:
                raise _err("multi_match slop under type 'best_fields'")
            return multi_match_best_fields(sel, terms, tie_breaker=tie,
                                           k=size)
        if mtype == "most_fields":
            if "slop" in q or "tie_breaker" in q:
                raise _err(
                    "multi_match options "
                    f"{sorted(set(q) & {'slop', 'tie_breaker'})} under "
                    "type 'most_fields'"
                )
            return bm25_topk_multifield(sel, boosts, terms, k=size)
        if mtype == "phrase":
            return multi_match_phrase(
                sel, terms, tie_breaker=tie, slop=int(q.get("slop", 0)),
                k=size,
            )
        if mtype == "cross_fields":
            if "slop" in q or "tie_breaker" in q:
                raise _err(
                    "multi_match options "
                    f"{sorted(set(q) & {'slop', 'tie_breaker'})} under "
                    "type 'cross_fields' (term-centric max has no "
                    "tie_breaker dial)"
                )
            return multi_match_cross_fields(sel, terms, k=size)
        if mtype == "bool_prefix":
            if "slop" in q:
                raise _err("multi_match slop under type 'bool_prefix'")
            return multi_match_bool_prefix(
                sel, str(q["query"]), tie_breaker=tie, k=size
            )
        raise _err(f"multi_match type {mtype!r}")

    if qtype == "query_string":
        extra = set(q) - {"query", "default_operator"}
        if extra:
            # default_field / fields / lenient / analyze_wildcard etc.
            raise _err(f"query_string options {sorted(extra)}")
        from pycasselastic_spark.operators.search_qs import (
            query_string_search,
        )

        return query_string_search(
            index, str(q["query"]),
            default_operator=str(q.get("default_operator", "or")),
            k=size,
            field_indexes=field_indexes,
        )

    if qtype == "combined_fields":
        extra = set(q) - {"query", "fields", "operator"}
        if extra:
            raise _err(f"combined_fields options {sorted(extra)}")
        if field_indexes is None:
            raise _err("combined_fields without field indexes")
        op = str(q.get("operator", "or"))
        if op not in ("or", "and"):
            raise _err(f"combined_fields operator {op!r}")
        names, weights = [], {}
        for spec in q["fields"]:
            name, _, boost = str(spec).partition("^")
            names.append(name)
            if boost:
                if not boost.isdigit() or int(boost) < 1:
                    # ES rejects fractional combined_fields boosts: the
                    # synthetic tf must stay integral
                    raise _err(
                        f"combined_fields boost {spec!r} "
                        "(integer >= 1 only)"
                    )
                weights[name] = int(boost)
        missing = [f for f in names if f not in field_indexes]
        if missing:
            raise _err(
                f"combined_fields fields {missing} without a field index"
            )
        sel = {f: field_indexes[f] for f in names}
        first_an = sel[names[0]].analyzer
        if any(ix.analyzer != first_an for ix in sel.values()):
            raise _err(
                "combined_fields across fields with DIFFERENT analyzers "
                "(the synthetic combined field needs one chain)"
            )
        cterms = sel[names[0]].analyze_text(str(q["query"]))
        if not cterms:
            raise _err("combined_fields query analyzing to no terms")
        from pycasselastic_spark.operators.search_compose import (
            combined_fields_search,
        )

        if op == "and":
            # AND over the combined field: every distinct query term
            # must appear in SOME field — filter BEFORE the limit so
            # the page never under-fills (the conjunctive-probe law);
            # k=None skips the inner sort entirely, so the only sort
            # is the root TakeOrderedAndProject after the filter
            cid = sel[names[0]].id_col
            return (
                combined_fields_search(sel, cterms, weights=weights, k=None)
                .filter(F.col("n_hit_terms") == len(set(cterms)))
                .orderBy(F.col("score_q20").desc(), F.col(cid).asc())
                .limit(size)
            )
        return combined_fields_search(sel, cterms, weights=weights, k=size)

    if qtype == "intervals":
        field, ispec = _single(q, "intervals")
        ikind, ibody = _single(ispec, "intervals rule")
        if ikind != "match":
            # all_of/any_of/prefix/wildcard/fuzzy interval sources
            raise _err(f"intervals rule {ikind!r} (match only)")
        iextra = set(ibody) - {"query", "max_gaps", "ordered"}
        if iextra:
            raise _err(f"intervals match options {sorted(iextra)}")
        iterms = index.analyze_text(str(ibody["query"]))
        if len(iterms) < 2:
            raise _err(
                "intervals match with fewer than two terms (a one-term "
                "interval is the term query)"
            )
        if not bool(ibody.get("ordered", False)):
            # unordered intervals need the interval algebra span_near
            # also refuses — raise by the ES option name
            raise _err("intervals ordered=false (unordered algebra)")
        from pycasselastic_spark.operators.search_ext import (
            span_near_search,
        )

        max_gaps = int(ibody.get("max_gaps", -1))
        if max_gaps < 0:
            # ES's default -1 means UNBOUNDED gaps — that's a
            # conjunctive co-occurrence test, not a proximity probe;
            # require the explicit bound
            raise _err("intervals without a bounded max_gaps")
        # ES intervals match(ordered, max_gaps) IS Lucene's ordered
        # interval: all terms in order with at most max_gaps total
        # intervening positions — exactly the span_near total-stretch
        # law
        return span_near_search(index, iterms, slop=max_gaps,
                                in_order=True)

    if qtype == "span_near":
        extra = set(q) - {"clauses", "slop", "in_order"}
        if extra:
            raise _err(f"span_near options {sorted(extra)}")
        sterms = []
        for c in q["clauses"]:
            ckind, cbody = _single(c, "span clause")
            if ckind != "span_term":
                raise _err(f"span clause type {ckind!r} (span_term only)")
            _f, v = _single(cbody, "span_term")
            sterms.append(str(v))
        from pycasselastic_spark.operators.search_ext import (
            span_near_search,
        )

        return span_near_search(
            index, sterms, slop=int(q.get("slop", 0)),
            in_order=bool(q.get("in_order", True)),
        )
    if qtype == "span_or":
        extra = set(q) - {"clauses"}
        if extra or "clauses" not in q:
            raise _err(f"span_or body {sorted(q)} (expected clauses)")
        sterms = []
        for c in q["clauses"]:
            ckind, cbody = _single(c, "span_or clause")
            if ckind != "span_term":
                raise _err(
                    f"span_or clause type {ckind!r} (span_term only)"
                )
            _f, v = _single(cbody, "span_term")
            sterms.append(str(v))
        from pycasselastic_spark.operators.search_ext import (
            span_or_search,
        )

        return span_or_search(index, sterms)
    if qtype == "span_not":
        extra = set(q) - {"include", "exclude", "pre", "post", "dist"}
        if extra or "include" not in q or "exclude" not in q:
            raise _err(
                f"span_not body {sorted(q)} (expected include + exclude)"
            )
        if "dist" in q and ("pre" in q or "post" in q):
            raise _err("span_not dist beside pre/post (ES rejects both)")
        pre = int(q.get("dist", q.get("pre", 0)))
        post = int(q.get("dist", q.get("post", 0)))

        def _span_terms_of(body, what: str) -> tuple[list[str], int | None]:
            kind, spec = _single(body, what)
            if kind == "span_term":
                _f, v = _single(spec, "span_term")
                return [str(v)], None
            if kind == "span_or":
                terms = []
                for c in spec["clauses"]:
                    ck, cb = _single(c, f"{what} span_or clause")
                    if ck != "span_term":
                        raise _err(
                            f"{what} span_or clause type {ck!r} "
                            "(span_term only)"
                        )
                    _f, v = _single(cb, "span_term")
                    terms.append(str(v))
                return terms, None
            if kind == "span_near":
                terms = []
                for c in spec["clauses"]:
                    ck, cb = _single(c, f"{what} span_near clause")
                    if ck != "span_term":
                        raise _err(
                            f"{what} span_near clause type {ck!r} "
                            "(span_term only)"
                        )
                    _f, v = _single(cb, "span_term")
                    terms.append(str(v))
                if not bool(spec.get("in_order", True)):
                    raise _err(f"{what} span_near in_order=false")
                return terms, int(spec.get("slop", 0))
            raise _err(
                f"{what} span type {kind!r} "
                "(span_term / span_or / span_near)"
            )

        inc_terms, inc_slop = _span_terms_of(q["include"], "span_not include")
        exc_terms, exc_slop = _span_terms_of(q["exclude"], "span_not exclude")
        if exc_slop is not None:
            raise _err(
                "span_not exclude span_near (single-position exclude "
                "spans only)"
            )
        from pycasselastic_spark.operators.search_ext import (
            span_not_search,
        )

        return span_not_search(
            index, inc_terms, exc_terms, pre=pre, post=post,
            include_slop=inc_slop,
        )
    if qtype in ("span_containing", "span_within"):
        extra = set(q) - {"big", "little"}
        if extra or "big" not in q or "little" not in q:
            raise _err(
                f"{qtype} body {sorted(q)} (expected big + little)"
            )

        def _span_near_terms(body, what: str) -> tuple[list[str], int]:
            kind, spec = _single(body, what)
            if kind != "span_near":
                raise _err(
                    f"{what} span type {kind!r} (span_near only — the "
                    "big side must be able to enclose)"
                )
            if not bool(spec.get("in_order", True)):
                raise _err(f"{what} span_near in_order=false")
            out = []
            for c in spec["clauses"]:
                ck, cb = _single(c, f"{what} span_near clause")
                if ck != "span_term":
                    raise _err(
                        f"{what} span_near clause type {ck!r} "
                        "(span_term only)"
                    )
                _f, v = _single(cb, "span_term")
                out.append(str(v))
            return out, int(spec.get("slop", 0))

        def _little_terms(body, what: str) -> list[str]:
            kind, spec = _single(body, what)
            if kind == "span_term":
                _f, v = _single(spec, "span_term")
                return [str(v)]
            if kind == "span_or":
                out = []
                for c in spec["clauses"]:
                    ck, cb = _single(c, f"{what} span_or clause")
                    if ck != "span_term":
                        raise _err(
                            f"{what} span_or clause type {ck!r} "
                            "(span_term only)"
                        )
                    _f, v = _single(cb, "span_term")
                    out.append(str(v))
                return out
            raise _err(
                f"{what} span type {kind!r} (span_term / span_or)"
            )

        big_terms, big_slop = _span_near_terms(
            q["big"], f"{qtype} big"
        )
        little = _little_terms(q["little"], f"{qtype} little")
        from pycasselastic_spark.operators.search_ext import (
            span_containing_search,
        )

        return span_containing_search(
            index, big_terms, big_slop, little,
            within=(qtype == "span_within"),
        )
    if qtype == "span_first":
        extra = set(q) - {"match", "end"}
        if extra or "match" not in q or "end" not in q:
            raise _err(
                f"span_first body {sorted(q)} (expected match + end)"
            )
        mkind, mbody = _single(q["match"], "span_first match")
        if mkind != "span_term":
            raise _err(f"span_first match type {mkind!r} (span_term only)")
        _f, v = _single(mbody, "span_term")
        from pycasselastic_spark.operators.search_ext import (
            span_first_search,
        )

        return span_first_search(index, str(v), int(q["end"]))

    if qtype == "match_bool_prefix":
        # search-as-you-type WITHOUT position requirements: every
        # analyzed term is an optional (should) clause, the LAST one
        # expanded as a prefix (ES compiles exactly this bool) — the
        # unordered sibling of match_phrase_prefix
        _field, spec = _single(q, "match_bool_prefix")
        max_exp = 50
        if isinstance(spec, dict):
            extra = set(spec) - {"query", "max_expansions"}
            if extra:
                raise _err(f"match_bool_prefix options {sorted(extra)}")
            max_exp = int(spec.get("max_expansions", 50))
            spec = spec["query"]
        toks = index.analyze_text(str(spec))
        if not toks:
            raise _err("match_bool_prefix analyzing to no terms")
        fixed, last = toks[:-1], toks[-1]
        from pycasselastic_spark.operators.search_probes import (
            prefix_expansion_terms,
        )

        scoring = fixed + prefix_expansion_terms(index, last, max_exp)
        if not scoring:
            return index.postings.sparkSession.createDataFrame(
                [], f"{index.id_col} LONG, n_hit_terms LONG, score_q20 LONG"
            )
        return bm25_bool_query(index, must=[], should=scoring, k=size)

    if qtype == "match_phrase":
        _field, spec = _single(q, "match_phrase")
        slop = 0
        if isinstance(spec, dict):
            slop = int(spec.get("slop", 0))
            spec = spec["query"]
        terms = index.analyze_text(str(spec))
        return phrase_slop_search(index, terms, slop=slop)
    if qtype == "match_phrase_prefix":
        _field, spec = _single(q, "match_phrase_prefix")
        text = spec["query"] if isinstance(spec, dict) else str(spec)
        toks = index.analyze_text(str(text))
        return match_phrase_prefix(index, toks[:-1], toks[-1])
    if qtype == "prefix":
        _field, value = _single(q, "prefix")
        value = value["value"] if isinstance(value, dict) else value
        return bm25_topk_prefix(index, str(value), k=size)
    if qtype == "wildcard":
        _field, value = _single(q, "wildcard")
        value = value["value"] if isinstance(value, dict) else value
        return bm25_topk_wildcard(index, str(value), k=size)
    if qtype == "regexp":
        _field, value = _single(q, "regexp")
        value = value["value"] if isinstance(value, dict) else value
        return bm25_topk_regexp(index, str(value), k=size)
    if qtype == "bool":
        extra = set(q) - {
            "must", "should", "must_not", "filter", "minimum_should_match",
        }
        if extra:
            raise _err(f"bool options {sorted(extra)}")
        msm = int(q.get("minimum_should_match", 0))
        must_clauses = [
            _clause_terms(index, c) for c in q.get("must", [])
        ]
        for c, body_c in zip(must_clauses, q.get("must", [])):
            if not c:
                # a must clause whose text analyzes to nothing can
                # never be satisfied; ES would match nothing — raise
                # instead of silently returning an empty page
                raise _err(f"must clause analyzing to no terms: {body_c!r}")
        if "filter" in q:
            # filter context (non-scoring): served from the stored
            # doc-values relation; only the simple must+filter shape is
            # dispatched (must_not/should alongside filter would need a
            # composed probe — raise rather than silently approximate)
            if set(q) - {"must", "filter"}:
                raise _err(
                    "bool filter combined with "
                    f"{sorted(set(q) - {'must', 'filter'})}"
                )
            if any(len(set(c)) > 1 for c in must_clauses):
                # bm25_topk_filtered's min_match dial is per-TERM; a
                # multi-term match clause needs per-clause coverage,
                # which only bm25_bool_query implements — raise rather
                # than silently tighten OR-within-clause to AND
                raise _err(
                    "multi-term match clause inside bool.must alongside "
                    "filter (per-clause semantics not composable with "
                    "the filter-context probe)"
                )
            must = [t for c in must_clauses for t in c]
            return bm25_topk_filtered(
                index, must, _filter_predicates(q["filter"]), k=size,
                min_match=len(set(must)),
            )
        # must AND should pass CLAUSE structure through: a multi-term
        # match clause is satisfied when ANY of its analyzed terms
        # occurs (ES default operator OR inside match) —
        # bm25_bool_query's per-clause conditional aggregates
        # implement exactly that (round-10 advisor finding: flattening
        # silently returned a strict subset of ES's results); should
        # clauses need the structure for bool-level
        # minimum_should_match (N CLAUSES, not N terms)
        should_clauses = [
            _clause_terms(index, c) for c in q.get("should", [])
        ]
        must_not = [
            t for c in q.get("must_not", []) for t in _clause_terms(index, c)
        ]
        return bm25_bool_query(
            index, must=must_clauses, should=should_clauses,
            must_not=must_not, k=size, min_should_match=msm,
        )
    raise _err(f"query type {qtype!r}")


def es_mget(index: PostingsIndex, ids: list) -> DataFrame:
    """ES ``_mget``: fetch docs BY ID in REQUEST ORDER, one response
    row per requested id with ``found`` false for absent ids (deleted
    or never ingested) — the batched point-lookup every sync loop and
    cache-refill runs (the reference GETs docs back from ES after
    upserting, the round-trip this serves). Returns ``(pos, <id>,
    found, <stored fields...>)`` ordered by request position, stored
    fields NULL when not found.

    Plan: the id list is a literal inline relation (request-bounded);
    one broadcast join against the live doc-values scan — the stored
    fields ARE the _source this engine keeps columnar. Indexes without
    doc-values raise (nothing stored to fetch)."""
    from pycasselastic_spark.operators.search_index import dv_col

    if not ids:
        raise ValueError("_mget needs at least one id")
    if index.docvalues is None:
        raise ValueError(
            "_mget needs an index with stored fields (doc-values) — "
            "nothing is stored to fetch"
        )
    id_col = index.id_col
    dv = index.live_docvalues()
    spark = dv.sparkSession
    req = spark.createDataFrame(
        [(n, int(v)) for n, v in enumerate(ids)],
        f"pos long, {id_col} long",
    )
    fields = [dv_col(f).alias(f) for f in index.stored_fields]
    # the ids are driver-side literals: push the IN filter into the
    # doc-values parquet scan, so the fetch side is request-sized and
    # broadcastable (a bare left join here could not broadcast its
    # preserved side and fell back to a shuffle — plan-audited)
    got = (
        dv.filter(F.col(id_col).isin([int(v) for v in ids]))
        .select(F.col(id_col), F.lit(True).alias("found"), *fields)
    )
    return (
        req.join(F.broadcast(got), id_col, "left")
        .withColumn("found", F.coalesce(F.col("found"), F.lit(False)))
        .orderBy("pos")
    )


def es_count(index: PostingsIndex, body: dict) -> DataFrame:
    """ES ``_count``: the hit COUNT of a query body without fetching
    hits — the cheapest request ES serves and the one monitoring
    dashboards poll. Accepts the same query shapes the aggregation
    scope dispatcher does (match / term / match_all / exists / range /
    terms / bool); unsupported shapes raise by name. Returns one row
    ``(n_hits,)``.

    Plan: the hit-id relation reduced by ONE count — no stored-field
    fetch, no scoring, no sort."""
    from pycasselastic_spark.operators.search_index import hits_relation

    extra = set(body) - {"query"}
    if extra:
        raise _err(f"_count body keys {sorted(extra)}")
    qtype, q = _single(body.get("query", {}), "query")
    scope = _agg_scope(index, qtype, q)
    ids = hits_relation(index, scope)
    return ids.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))


# ES _search/template: mustache variable nodes. Sections ({{#...}},
# {{^...}}), partials ({{>...}}) and comments ({{!...}}) are
# CONDITIONAL template logic — they can change the request's JSON
# shape, so they raise by name instead of rendering wrongly.
_MUSTACHE_VAR = re.compile(r"\{\{\s*(\w+)\s*\}\}")
_MUSTACHE_SECTION = re.compile(r"\{\{\s*[#^>!/]")


def _render_template(node, params: dict):
    if isinstance(node, str):
        if _MUSTACHE_SECTION.search(node):
            raise _err(
                f"search template section/partial in {node!r} "
                "(conditional mustache is not dispatched — variable "
                "nodes only)"
            )
        if "{{{" in node or "}}}" in node:
            # triple mustache ({{{unescaped}}}) would slip past the
            # variable matcher and render '{5}'-style garbage — the
            # forbidden silent-mis-render (round-14 review finding)
            raise _err(
                f"search template triple mustache in {node!r} "
                "(unescaped-variable syntax is not dispatched)"
            )
        whole = _MUSTACHE_VAR.fullmatch(node)
        if whole:
            # a value that IS one variable keeps the param's native
            # JSON type — "{{k}}" with params.k=5 renders the number
            name = whole.group(1)
            if name not in params:
                raise _err(f"search template param {name!r} missing")
            return params[name]

        def sub(m: "re.Match[str]") -> str:
            name = m.group(1)
            if name not in params:
                raise _err(f"search template param {name!r} missing")
            v = params[name]
            if isinstance(v, (dict, list)):
                raise _err(
                    f"search template param {name!r} is non-scalar "
                    "but embedded in a string"
                )
            return str(v)

        return _MUSTACHE_VAR.sub(sub, node)
    if isinstance(node, dict):
        for k in node:
            if "{{" in str(k):
                raise _err(
                    f"search template variable in object KEY {k!r} "
                    "(value positions only)"
                )
        return {k: _render_template(v, params) for k, v in node.items()}
    if isinstance(node, list):
        return [_render_template(v, params) for v in node]
    return node


def es_search_template(
    index: PostingsIndex,
    body: dict,
    **kwargs,
) -> DataFrame:
    """ES ``_search/template``: render a mustache-parameterized
    request body, then dispatch it through ``es_search`` — the
    "saved search with blanks" API every Kibana saved query uses.

    Dispatched surface: the INLINE dict ``source`` with ``params``;
    variable nodes ``{{name}}`` only. A value that is exactly one
    variable keeps the param's native JSON type (``"size":
    "{{k}}"`` renders the number); embedded variables stringify;
    missing params, non-scalar embedded params, variables in object
    keys, string-form sources and conditional mustache
    (sections/partials/comments) all raise by name — a
    mis-rendered template is a silently different query, the
    dispatcher's forbidden failure mode. Stored-template ids need a
    template store; not dispatched.

    ``kwargs`` pass through to ``es_search`` (docs frame,
    field_indexes, join_field, ...). Rendering is driver-side string
    work on a request-sized object; the plan is whatever the
    rendered body dispatches."""
    extra = set(body) - {"source", "params"}
    if extra:
        raise _err(f"search template options {sorted(extra)}")
    if "source" not in body:
        raise _err("search template without source (stored-template "
                   "ids are not dispatched)")
    source = body["source"]
    if not isinstance(source, dict):
        raise _err(
            "string-form template source (conditional mustache JSON "
            "assembly — dict source only)"
        )
    rendered = _render_template(source, dict(body.get("params", {})))
    return es_search(index, rendered, **kwargs)


def es_msearch_template(
    index: PostingsIndex,
    searches: dict[str, dict],
    k: int = 10,
) -> DataFrame:
    """ES ``_msearch/template``: a batch of NAMED template requests
    rendered and answered in ONE pass over the index — template
    rendering composed onto ``bm25_msearch``'s amortization (the
    postings probe, df aggregation and scoring shuffle are paid once
    for the union of all rendered query terms). Returns
    ``(query_id, id, n_hit_terms, score_q20, rank)``.

    Dispatched rendered shape: each template must render to a plain
    ``{"query": {"match": {field: text}}}`` body, optionally with
    ``size`` — and every ``size`` in the batch must agree with ``k``
    (ES allows per-line sizes; a mixed batch would silently return
    differently-truncated pages, so it raises by name). Renders
    follow every ``es_search_template`` law (sections, triple
    mustache, missing params all raise). Non-match rendered bodies
    raise — heterogeneous batches dispatch line-by-line through
    ``es_search_template`` instead."""
    from pycasselastic_spark.operators.search_probes import bm25_msearch

    term_map: dict[str, list[str]] = {}
    for qid in sorted(searches):
        body = searches[qid]
        extra = set(body) - {"source", "params"}
        if extra:
            raise _err(
                f"msearch template {qid!r} options {sorted(extra)}"
            )
        if "source" not in body or not isinstance(body["source"], dict):
            raise _err(
                f"msearch template {qid!r} without a dict source"
            )
        rendered = _render_template(
            body["source"], dict(body.get("params", {}))
        )
        rextra = set(rendered) - {"query", "size"}
        if rextra:
            raise _err(
                f"msearch template {qid!r} rendered body keys "
                f"{sorted(rextra)} (the batched path is plain match "
                "only — dispatch other shapes via es_search_template)"
            )
        if "size" in rendered and int(rendered["size"]) != int(k):
            raise _err(
                f"msearch template {qid!r} size {rendered['size']!r} "
                f"!= batch k={k} (mixed per-line sizes would silently "
                "truncate differently — use one batch size)"
            )
        qkind, qbody = _single(
            rendered.get("query", {}), f"msearch template {qid!r} query"
        )
        if qkind != "match":
            raise _err(
                f"msearch template {qid!r} rendered query type "
                f"{qkind!r} (match only on the batched path)"
            )
        terms = index.analyze_text(_match_text(qbody, "msearch template"))
        if not terms:
            raise _err(
                f"msearch template {qid!r} analyzing to no terms"
            )
        term_map[qid] = terms
    if not term_map:
        raise _err("msearch template batch is empty")
    return bm25_msearch(index, term_map, k=int(k))
