"""ES ``query_string`` — the full Lucene query grammar, compiled onto
the stored-index probe family through a hit-relation algebra.

The reference's ES dependency serves this grammar on every Kibana
search box; here the subset with deterministic, index-served
semantics is dispatched and everything else raises by name:

* leaves: bare terms, ``"quoted phrases"`` (``~N`` slop), trailing
  ``*`` prefixes, ``~N`` fuzzy terms
* operators: ``AND`` / ``&&``, ``OR`` / ``||``, ``NOT`` / ``!``,
  parenthesized grouping, with Lucene precedence NOT > AND > OR and
  the body's ``default_operator`` filling bare adjacency
* raised by name: ``field:`` scoping, ``^boost``, range syntax
  (``[a TO b]``), leading/inner wildcards, regex ``/…/``, the
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


def _lex(s: str) -> list[tuple]:
    """Tokens: ('lparen',) ('rparen',) ('op', AND|OR|NOT) and leaves
    ('term', v) ('phrase', text, slop) ('prefix', v) ('fuzzy', v, d)."""
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
            continue
        if ch == '"':
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
            toks.append(("phrase", text, slop))
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
    if "^" in word:
        raise _err(f"boost syntax {word!r}")
    if word in ("[", "]", "{", "}", "TO") or word.startswith(("[", "{")):
        raise _err(f"range syntax near {word!r}")
    if word.startswith("/") and word.endswith("/") and len(word) > 1:
        raise _err(f"regex clause {word!r}")
    if "~" in word:
        base, _, d = word.rpartition("~")
        if not d.isdigit() or not base or "*" in base or "~" in base:
            raise _err(f"fuzzy syntax in {word!r}")
        return ("fuzzy", base, int(d))
    if word.endswith("*"):
        if "*" in word[:-1] or len(word) == 1:
            raise _err(
                f"wildcard syntax in {word!r} "
                "(only a trailing '*' prefix is dispatched)"
            )
        return ("prefix", word[:-1])
    if "*" in word or "?" in word:
        raise _err(f"non-trailing wildcard in {word!r}")
    return ("term", word)


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
            "lparen", "term", "phrase", "prefix", "fuzzy"
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
            return node
        if t[0] == "rparen":
            raise _err("unbalanced parenthesis")
        if t[0] == "op":
            raise _err(f"operator {t[1]} without a left operand")
        self.i += 1
        return t


# --- compiler: hit-relation algebra ------------------------------------------


def _compile(index: PostingsIndex, node, k1: float, b: float) -> DataFrame:
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
        terms = prefix_expansion_terms(index, node[1])
        if not terms:
            raise _err(f"prefix {node[1]!r} expanding to no terms")
        return scored(terms)
    if kind == "fuzzy":
        expanded = expand_fuzzy_terms(index, [node[1]], node[2])
        return scored(sorted(set(expanded) | {node[1]}))
    if kind == "not":
        raise _err(
            "pure-negative query (Lucene matches nothing — require a "
            "positive clause: x AND NOT y)"
        )
    left, right = node[1], node[2]
    if kind == "andnot":
        if left[0] == "not":
            raise _err("pure-negative query")
        l_df = _compile(index, left, k1, b)
        r_df = _compile_positive(index, right, k1, b)
        return l_df.join(r_df.select(id_col), id_col, "left_anti")
    if kind == "and":
        # x AND NOT y arrives as ('and', x, ('not', y)) via unary NOT
        if right[0] == "not" and left[0] == "not":
            raise _err("pure-negative query")
        if right[0] == "not":
            return _compile(index, ("andnot", left, right[1]), k1, b)
        if left[0] == "not":
            return _compile(index, ("andnot", right, left[1]), k1, b)
        l_df = _compile(index, left, k1, b)
        r_df = _compile(index, right, k1, b)
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
        l_df = _compile(index, left, k1, b)
        r_df = _compile(index, right, k1, b)
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


def _compile_positive(index, node, k1, b):
    if node[0] == "not":
        raise _err("double negation")
    return _compile(index, node, k1, b)


def _count_leaves(node) -> int:
    if node[0] in ("term", "phrase", "prefix", "fuzzy"):
        return 1
    if node[0] == "not":
        return _count_leaves(node[1])
    return _count_leaves(node[1]) + _count_leaves(node[2])


def query_string_search(
    index: PostingsIndex,
    query: str,
    default_operator: str = "or",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Parse and execute a Lucene ``query_string`` against the stored
    index. Returns ``(id, score_q20)`` top-k (score = integer sum of
    matched clause scores, Lucene's combination law). See the module
    docstring for the dispatched grammar."""
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
    out = _compile(index, ast, k1, b)
    id_col = index.id_col
    return (
        out.orderBy(F.col("score_q20").desc(), F.col(id_col).asc())
        .limit(k)
    )
