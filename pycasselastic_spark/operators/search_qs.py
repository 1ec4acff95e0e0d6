"""ES ``query_string`` — the full Lucene query grammar, compiled onto
the stored-index probe family through a hit-relation algebra.

The reference's ES dependency serves this grammar on every Kibana
search box; here the subset with deterministic, index-served
semantics is dispatched and everything else raises by name:

* leaves: bare terms, ``"quoted phrases"`` (``~N`` slop), trailing
  ``*`` prefixes, ``~N`` fuzzy terms (prefix/fuzzy bases normalized
  through the analyzer's character pipeline — Lucene's
  ``Analyzer.normalize`` contract), ``field:[a TO b]`` /
  ``field:{a TO b}`` ranges over stored doc-values (constant score
  1.0, ``*`` open endpoints, ``[* TO *]`` = exists)
* ``field:`` scoping on any leaf, resolved against the per-field
  index registry multi_match uses (``field_indexes``); ``^boost``
  (INTEGER >= 1 — scores live in exact Q20 space; fractional boosts
  raise by name) on leaves and parenthesized groups
* operators: ``AND`` / ``&&``, ``OR`` / ``||``, ``NOT`` / ``!``,
  parenthesized grouping, with Lucene precedence NOT > AND > OR and
  the body's ``default_operator`` filling bare adjacency
* raised by name: ``field:(grouped)`` scope distribution,
  leading/inner wildcards, regex ``/…/``, fractional boosts, the
  error-forgiving lenient mode

Scoring is Lucene's: a document's score is the SUM of the scores of
the clauses it matches (each leaf a Q20-floored BM25 /
phrase / prefix-expansion / fuzzy score from the standalone probes),
combined in INTEGER space so no float-order noise stacks — ``AND`` is
an inner join (both scores sum), ``OR`` a full outer join
(coalesce-sum), ``AND NOT`` an anti join. Every relation in the
algebra is query-bounded (pruned postings probes), so compositions
never touch the corpus.

Pure-negative queries (``NOT x`` with nothing required) match nothing
in Lucene and raise here; ``NOT`` directly under ``OR`` raises too —
Lucene's prohibited-clause semantics in an OR context is a common
silent-miss trap, and this dispatcher prefers a named error.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_index import PostingsIndex

# registered leaf budget — ES's indices.query.bool.max_clause_count
# spirit: a runaway machine-generated query should fail loudly
_MAX_LEAVES = 64


def _err(what: str) -> ValueError:
    return ValueError(f"query_string: unsupported {what}")


# --- lexer -------------------------------------------------------------------

_WORD = re.compile(r'[^\s()"]+')
_FIELD = re.compile(r"([A-Za-z_][\w.]*):")
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)")
_RANGE = re.compile(
    r"([\[\{])\s*([^\s\]\}]+)\s+TO\s+([^\s\]\}]+)\s*([\]\}])"
)


def _boost_wrap(node: tuple, boost: str | None) -> tuple:
    """Lucene ``^boost``: a multiplicative factor on the leaf's score.
    Scores are exact Q20 integers, so the factor must be an integer
    >= 1 (same law as combined_fields' integral boosts) — a
    fractional boost would force float score space and raise by name."""
    if boost is None:
        return node
    if "." in boost:
        raise _err(
            f"fractional boost ^{boost} (scores are exact Q20 "
            "integers — integer boosts >= 1 only)"
        )
    n = int(boost)
    if n < 1:
        raise _err(f"boost ^{boost} (integer >= 1 only)")
    return node if n == 1 else ("boost", n, node)


def _lex_quoted(s: str, i: int) -> tuple[tuple, int]:
    """A '"...'" phrase starting at ``i``: returns the leaf (with ~slop
    and ^boost suffixes consumed) and the next position."""
    j = s.find('"', i + 1)
    if j < 0:
        raise _err("unterminated phrase quote")
    text = s[i + 1:j]
    i = j + 1
    slop = 0
    m = re.match(r"~(\d+)", s[i:])
    if m:
        slop = int(m.group(1))
        i += m.end()
    node = ("phrase", text, slop)
    m = _BOOST.match(s, i)
    if m:
        node = _boost_wrap(node, m.group(1))
        i = m.end()
    return node, i


def _lex(s: str) -> list[tuple]:
    """Tokens: ('lparen',) ('rparen',) ('boostmark', n) ('op',
    AND|OR|NOT) and leaves ('term', v) ('phrase', text, slop)
    ('prefix', v) ('fuzzy', v, d) ('range', lo, hi, lo_incl, hi_incl)
    — leaves optionally wrapped in ('field', name, leaf) and
    ('boost', n, leaf)."""
    toks: list[tuple] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            toks.append(("lparen",))
            i += 1
            continue
        if ch == ")":
            toks.append(("rparen",))
            i += 1
            # '(a OR b)^2' — Lucene's group boost rides the closing
            # parenthesis; the parser applies it on group close.
            # _boost_wrap validates (fractional AND ^0 raise — the
            # leaf path's law; review finding: ^0 was silently the
            # identity here while 'spark^0' raised)
            m = _BOOST.match(s, i)
            if m:
                marked = _boost_wrap(("group",), m.group(1))
                n_boost = marked[1] if marked[0] == "boost" else 1
                toks.append(("boostmark", n_boost))
                i = m.end()
            continue
        if ch == '"':
            node, i = _lex_quoted(s, i)
            toks.append(node)
            continue
        fm = _FIELD.match(s, i)
        if fm:
            fname = fm.group(1)
            if fname not in ("AND", "OR", "NOT", "TO"):
                j = fm.end()
                if j < n and s[j] == '"':
                    inner, i = _lex_quoted(s, j)
                    toks.append(("field", fname, inner))
                    continue
                if j < n and s[j] == "(":
                    raise _err(
                        f"field-scoped group {fname}:(...) (scope "
                        "each leaf: f:a OR f:b)"
                    )
                rm = _RANGE.match(s, j)
                if rm:
                    node = ("range", rm.group(2), rm.group(3),
                            rm.group(1) == "[", rm.group(4) == "]")
                    i = rm.end()
                    bm = _BOOST.match(s, i)
                    if bm:
                        node = _boost_wrap(node, bm.group(1))
                        i = bm.end()
                    toks.append(("field", fname, node))
                    continue
                if j < n and s[j] in "[{":
                    raise _err(f"range syntax after {fname!r}:")
                wm = _WORD.match(s, j)
                if not wm:
                    raise _err(f"field {fname!r}: without a value")
                i = wm.end()
                toks.append(("field", fname, _leaf(wm.group(0))))
                continue
        m = _WORD.match(s, i)
        word = m.group(0)
        i = m.end()
        if word in ("AND", "&&"):
            toks.append(("op", "AND"))
        elif word in ("OR", "||"):
            toks.append(("op", "OR"))
        elif word in ("NOT", "!"):
            toks.append(("op", "NOT"))
        elif word.startswith("!"):
            toks.append(("op", "NOT"))
            toks.extend(_lex(word[1:]))
        else:
            toks.append(_leaf(word))
    return toks


def _leaf(word: str) -> tuple:
    if word[0] in "+-":
        # Lucene's +required/-prohibited operators: the analyzer's
        # punctuation strip would silently turn '-bar' into a POSITIVE
        # 'bar' clause — the forbidden failure mode; the AND / AND NOT
        # grammar expresses both, so raise by name
        raise _err(
            f"Lucene {word[0]!r} operator in {word!r} "
            "(use AND / AND NOT)"
        )
    if ":" in word:
        raise _err(f"field-scoped clause {word!r}")
    boost = None
    bm = re.search(r"\^(\d+(?:\.\d+)?)$", word)
    if bm:
        boost, word = bm.group(1), word[:bm.start()]
        if not word:
            raise _err(f"boost ^{boost} without an operand")
    if "^" in word:
        raise _err(f"boost syntax {word!r}")
    if word in ("[", "]", "{", "}", "TO") or word.startswith(("[", "{")):
        raise _err(
            f"range syntax near {word!r} (ranges are field-scoped: "
            "f:[a TO b])"
        )
    if word.startswith("/") and word.endswith("/") and len(word) > 1:
        raise _err(f"regex clause {word!r}")
    if "~" in word:
        base, _, d = word.rpartition("~")
        if not d.isdigit() or not base or "*" in base or "~" in base:
            raise _err(f"fuzzy syntax in {word!r}")
        return _boost_wrap(("fuzzy", base, int(d)), boost)
    if word.endswith("*"):
        if "*" in word[:-1] or len(word) == 1:
            raise _err(
                f"wildcard syntax in {word!r} "
                "(only a trailing '*' prefix is dispatched)"
            )
        return _boost_wrap(("prefix", word[:-1]), boost)
    if "*" in word or "?" in word:
        raise _err(f"non-trailing wildcard in {word!r}")
    return _boost_wrap(("term", word), boost)


# --- parser (Lucene precedence: NOT > AND > OR) ------------------------------


class _Parser:
    def __init__(self, toks: list[tuple], default_op: str):
        self.toks = toks
        self.i = 0
        self.default_op = default_op

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _starts_operand(self, t) -> bool:
        return t is not None and t[0] in (
            "lparen", "term", "phrase", "prefix", "fuzzy",
            "field", "boost", "range",
        )

    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            raise _err(f"trailing token {self.peek()!r}")
        return node

    def parse_or(self):
        left = self.parse_and()
        while True:
            t = self.peek()
            if t == ("op", "OR"):
                self.i += 1
                left = ("or", left, self.parse_and())
            elif self.default_op == "or" and self._starts_operand(t):
                left = ("or", left, self.parse_and())
            elif t == ("op", "NOT") and self.default_op == "or":
                # NOT in an OR context: Lucene prohibits the clause
                # globally — a silent-miss trap; require AND NOT
                raise _err(
                    "NOT under OR (use AND NOT or parentheses — "
                    "Lucene's prohibited-clause OR semantics is a "
                    "silent-miss trap)"
                )
            else:
                return left

    def parse_and(self):
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t == ("op", "AND"):
                self.i += 1
                left = ("and", left, self.parse_unary())
            elif t == ("op", "NOT"):
                self.i += 1
                left = ("andnot", left, self.parse_unary())
            elif self.default_op == "and" and self._starts_operand(t):
                left = ("and", left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        t = self.peek()
        if t == ("op", "NOT"):
            self.i += 1
            return ("not", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t is None:
            raise _err("query ending in an operator")
        if t[0] == "lparen":
            self.i += 1
            node = self.parse_or()
            if self.peek() != ("rparen",):
                raise _err("unbalanced parenthesis")
            self.i += 1
            nxt = self.peek()
            if nxt is not None and nxt[0] == "boostmark":
                # '(a OR b)^2': the group boost multiplies the summed
                # subtree score — Lucene's multiplicative boost law
                self.i += 1
                if nxt[1] > 1:
                    node = ("boost", nxt[1], node)
            return node
        if t[0] == "rparen":
            raise _err("unbalanced parenthesis")
        if t[0] == "boostmark":
            raise _err("boost without an operand")
        if t[0] == "op":
            raise _err(f"operator {t[1]} without a left operand")
        self.i += 1
        return t


# --- compiler: hit-relation algebra ------------------------------------------


def _normalize_base(index: PostingsIndex, base: str) -> str:
    """Prefix/fuzzy bases through the analyzer's CHARACTER pipeline
    (Lucene's ``Analyzer.normalize`` contract): ``Spark*`` under a
    lowercasing analyzer expands like ``spark*`` instead of raising
    'expanding to no terms' while the bare term matches — term leaves
    are fully analyzed, so the two leaf families stay consistent
    within one grammar. Token filters (stop/synonym/stem) do NOT run —
    stemming a prefix would change what it prefixes. Legacy
    (analyzer=None) indexes match raw bytes, so the base stays raw."""
    if index.analyzer is None:
        return base
    out = index.analyzer.normalize_base_py(base)
    if not out:
        raise _err(f"prefix/fuzzy base normalizing to nothing: {base!r}")
    return out


def _range_endpoint(raw: str):
    """A range endpoint literal, typed: ``*`` is the open bound,
    integers and doubles parse numerically, anything else stays a
    string (Spark casts the literal to the doc-values column's type —
    ISO dates against date columns compare correctly)."""
    if raw == "*":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def _compile_range(index: PostingsIndex, fname: str, node) -> DataFrame:
    """``f:[a TO b]`` / ``f:{a TO b}``: a constant-score doc-values
    scan — Lucene rewrites multi-term queries to constant score 1.0
    in query_string context, so every hit carries exactly Q20. Open
    ``*`` endpoints drop their bound; ``[* TO *]`` is the exists
    test. Predicates push into the columnar scan via filtered_ids."""
    from pycasselastic_spark.operators.search_compose import Q20
    from pycasselastic_spark.operators.search_hybrid import filtered_ids

    _, lo_raw, hi_raw, lo_incl, hi_incl = node
    lo, hi = _range_endpoint(lo_raw), _range_endpoint(hi_raw)
    preds = []
    if lo is not None:
        preds.append((fname, ">=" if lo_incl else ">", lo))
    if hi is not None:
        preds.append((fname, "<=" if hi_incl else "<", hi))
    if not preds:
        preds.append((fname, "exists", None))
    return filtered_ids(index, preds).withColumn(
        "score_q20", F.lit(int(Q20)).cast("long")
    )


def _resolve_field_index(
    index: PostingsIndex,
    field_indexes: dict[str, PostingsIndex] | None,
    fname: str,
) -> PostingsIndex:
    """``field:value`` resolution: the per-field postings index from
    ``field_indexes`` (the same registry multi_match uses). The
    resolved index must share the main index's id column — scores
    from different fields integer-sum per doc, which only makes
    sense over one document set."""
    sub = (field_indexes or {}).get(fname)
    if sub is None:
        raise _err(
            f"field {fname!r} without a field index (pass "
            "field_indexes={...} — the multi_match registry; ranges "
            "use stored doc-values: f:[a TO b])"
        )
    if sub.id_col != index.id_col:
        raise _err(
            f"field index {fname!r} over a different document set "
            f"(id_col {sub.id_col!r} vs {index.id_col!r})"
        )
    return sub


def _compile(index: PostingsIndex, node, k1: float, b: float,
             field_indexes: dict[str, PostingsIndex] | None = None,
             ) -> DataFrame:
    """Leaf -> (id, s) probe relation; AND/OR/AND NOT -> join algebra.
    Scores are Q20 integers throughout, so every combination is an
    exact integer sum."""
    from pycasselastic_spark.operators.search_compose import (
        _phrase_field_scored,
    )
    from pycasselastic_spark.operators.search_probes import (
        _bm25_scored,
        expand_fuzzy_terms,
        prefix_expansion_terms,
    )

    id_col = index.id_col
    kind = node[0]

    if kind == "boost":
        inner = _compile(index, node[2], k1, b, field_indexes)
        return inner.select(
            id_col,
            (F.col("score_q20") * F.lit(int(node[1]))).cast("long")
            .alias("score_q20"),
        )
    if kind == "field":
        fname, leaf = node[1], node[2]
        if leaf[0] == "range":
            return _compile_range(index, fname, leaf)
        if leaf[0] == "boost":
            # f:term^2 — boost rides outside the field scope
            return _compile(
                index, ("boost", leaf[1], ("field", fname, leaf[2])),
                k1, b, field_indexes,
            )
        sub = _resolve_field_index(index, field_indexes, fname)
        return _compile(sub, leaf, k1, b, field_indexes)
    if kind == "range":
        raise _err(
            "range without a field scope (ranges read stored "
            "doc-values: f:[a TO b])"
        )

    def scored(probe_terms: list[str]) -> DataFrame:
        # UNORDERED leaf relation: leaves feed joins, so ranking here
        # would force a useless single-partition global sort per leaf
        # (plan-audited); the one TakeOrderedAndProject happens at the
        # root
        return _bm25_scored(index, probe_terms, k1, b).select(
            id_col, "score_q20"
        )

    if kind == "term":
        terms = index.analyze_text(node[1])
        if not terms:
            raise _err(f"term analyzing to no tokens: {node[1]!r}")
        return scored(terms)
    if kind == "phrase":
        terms = index.analyze_text(node[1])
        if not terms:
            raise _err(f"phrase analyzing to no tokens: {node[1]!r}")
        if len(terms) == 1:
            return scored(terms)
        return _phrase_field_scored(index, terms, node[2], k1, b).select(
            id_col, "score_q20"
        )
    if kind == "prefix":
        base = _normalize_base(index, node[1])
        terms = prefix_expansion_terms(index, base)
        if not terms:
            raise _err(f"prefix {base!r} expanding to no terms")
        return scored(terms)
    if kind == "fuzzy":
        base = _normalize_base(index, node[1])
        expanded = expand_fuzzy_terms(index, [base], node[2])
        return scored(sorted(set(expanded) | {base}))
    if kind == "not":
        raise _err(
            "pure-negative query (Lucene matches nothing — require a "
            "positive clause: x AND NOT y)"
        )
    left, right = node[1], node[2]
    if kind == "andnot":
        if left[0] == "not":
            raise _err("pure-negative query")
        l_df = _compile(index, left, k1, b, field_indexes)
        r_df = _compile_positive(index, right, k1, b, field_indexes)
        return l_df.join(r_df.select(id_col), id_col, "left_anti")
    if kind == "and":
        # x AND NOT y arrives as ('and', x, ('not', y)) via unary NOT
        if right[0] == "not" and left[0] == "not":
            raise _err("pure-negative query")
        if right[0] == "not":
            return _compile(index, ("andnot", left, right[1]), k1, b,
                            field_indexes)
        if left[0] == "not":
            return _compile(index, ("andnot", right, left[1]), k1, b,
                            field_indexes)
        l_df = _compile(index, left, k1, b, field_indexes)
        r_df = _compile(index, right, k1, b, field_indexes)
        return (
            l_df.withColumnRenamed("score_q20", "_sl")
            .join(r_df.withColumnRenamed("score_q20", "_sr"), id_col)
            .select(
                id_col,
                (F.col("_sl") + F.col("_sr")).cast("long").alias("score_q20"),
            )
        )
    if kind == "or":
        if left[0] == "not" or right[0] == "not":
            raise _err("NOT under OR (use AND NOT or parentheses)")
        l_df = _compile(index, left, k1, b, field_indexes)
        r_df = _compile(index, right, k1, b, field_indexes)
        return (
            l_df.withColumnRenamed("score_q20", "_sl")
            .join(
                r_df.withColumnRenamed("score_q20", "_sr"),
                id_col,
                "full_outer",
            )
            .select(
                id_col,
                (
                    F.coalesce(F.col("_sl"), F.lit(0))
                    + F.coalesce(F.col("_sr"), F.lit(0))
                )
                .cast("long")
                .alias("score_q20"),
            )
        )
    raise _err(f"node {kind!r}")


def _compile_positive(index, node, k1, b, field_indexes=None):
    if node[0] == "not":
        raise _err("double negation")
    return _compile(index, node, k1, b, field_indexes)


def _count_leaves(node) -> int:
    if node[0] in ("term", "phrase", "prefix", "fuzzy", "range"):
        return 1
    if node[0] == "not":
        return _count_leaves(node[1])
    if node[0] in ("boost", "field"):
        return _count_leaves(node[2])
    return _count_leaves(node[1]) + _count_leaves(node[2])


def query_string_search(
    index: PostingsIndex,
    query: str,
    default_operator: str = "or",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    field_indexes: dict[str, PostingsIndex] | None = None,
) -> DataFrame:
    """Parse and execute a Lucene ``query_string`` against the stored
    index. Returns ``(id, score_q20)`` top-k (score = integer sum of
    matched clause scores, Lucene's combination law). ``field_indexes``
    is the per-field registry ``field:value`` clauses resolve against
    (the same dict multi_match takes); ranges read the MAIN index's
    stored doc-values. See the module docstring for the dispatched
    grammar."""
    default_operator = str(default_operator).lower()
    if default_operator not in ("or", "and"):
        raise _err(f"default_operator {default_operator!r}")
    toks = _lex(str(query))
    if not toks:
        raise _err("empty query")
    ast = _Parser(toks, default_operator).parse()
    n_leaves = _count_leaves(ast)
    if n_leaves > _MAX_LEAVES:
        raise _err(
            f"{n_leaves} clauses (max_clause_count {_MAX_LEAVES})"
        )
    out = _compile(index, ast, k1, b, field_indexes)
    id_col = index.id_col
    return (
        out.orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )
