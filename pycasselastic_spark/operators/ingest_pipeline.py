"""ES ingest pipelines (``_ingest/pipeline`` / ``_simulate``): the
processor chain every document passes through before indexing — the
reference's sync loop bulk-writes into ES where exactly these
processors run (set/rename/convert are the classic type-coercion
layer its ``convert_xxx`` helpers hand-rolled, ``pyCassElastic.py``
scalar conversions, SURVEY §2.1 O13).

Each supported processor is ONE narrow Spark column expression, so a
whole pipeline compiles to a single projection — Catalyst collapses
the sequential ``withColumn`` chain into one stage, whole-stage
codegen keeps it JVM-side, and the pipeline costs nothing beyond the
scan it rides on at any corpus size. Unsupported processors and
options raise by name (a silently-skipped processor is how ingest
pipelines corrupt downstream data).

Supported processors (ES body shapes):

* ``set``       {"field", "value", "override"?}  — constant assign
* ``remove``    {"field"}                        — drop the column
* ``rename``    {"field", "target_field"}
* ``lowercase`` / ``uppercase`` / ``trim``  {"field"}
* ``split``     {"field", "separator"}          — regex, array out
* ``gsub``      {"field", "pattern", "replacement"} — regex replace
* ``convert``   {"field", "type": integer|long|float|double|string|
                 boolean, "ignore_failure"?} — ES's cast table; a
                 malformed value FAILS the job (Spark's ANSI cast =
                 ES's default fail-the-document), and
                 ``ignore_failure: true`` maps to ``try_cast`` (the
                 bad value becomes NULL, the pipeline continues —
                 exactly ES's ignore_failure)

ES processor conditionals (``if``), ``on_failure`` handlers, and the
script processor raise by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONVERT_TYPES = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _err(what: str) -> ValueError:
    return ValueError(f"ingest pipeline: unsupported {what}")


def _need(
    body: dict, required: set[str], optional: set[str], kind: str
) -> None:
    extra = set(body) - required - optional
    if extra:
        # 'if'/'on_failure'/'ignore_missing' and friends raise by name
        raise _err(f"{kind} options {sorted(extra)}")
    missing = required - set(body)
    if missing:
        raise _err(f"{kind} missing {sorted(missing)}")


def _field(df: DataFrame, body: dict, kind: str) -> str:
    f = str(body["field"])
    if f not in df.columns:
        raise _err(f"{kind} field {f!r} (columns: {df.columns})")
    return f


def simulate_pipeline(docs: DataFrame, processors: list[dict]) -> DataFrame:
    """Run an ES ingest-processor list over a frame — the
    ``_simulate`` endpoint's semantics, applied at corpus scale
    instead of to a sample doc. Processors apply IN ORDER (each sees
    the previous one's output, exactly ES); the result is the frame
    a ``_bulk`` through that pipeline would have indexed."""
    out = docs
    for i, proc in enumerate(processors):
        if not isinstance(proc, dict) or len(proc) != 1:
            raise _err(f"processor #{i}: {proc!r} (one name per entry)")
        kind, body = next(iter(proc.items()))
        if kind == "set":
            _need(body, {"field", "value"}, {"override"}, "set")
            f = str(body["field"])
            val = F.lit(body["value"])
            if f in out.columns and not bool(body.get("override", True)):
                # ES: override=false only fills NULL/missing values
                out = out.withColumn(f, F.coalesce(F.col(f), val))
            else:
                out = out.withColumn(f, val)
        elif kind == "remove":
            _need(body, {"field"}, set(), "remove")
            out = out.drop(_field(out, body, "remove"))
        elif kind == "rename":
            _need(body, {"field", "target_field"}, set(), "rename")
            f = _field(out, body, "rename")
            t = str(body["target_field"])
            if t in out.columns:
                raise _err(
                    f"rename target {t!r} already exists (ES fails "
                    "the document here)"
                )
            out = out.withColumnRenamed(f, t)
        elif kind in ("lowercase", "uppercase", "trim"):
            _need(body, {"field"}, set(), kind)
            f = _field(out, body, kind)
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[kind]
            out = out.withColumn(f, fn(F.col(f)))
        elif kind == "split":
            _need(body, {"field", "separator"}, set(), "split")
            f = _field(out, body, "split")
            out = out.withColumn(
                f, F.split(F.col(f), str(body["separator"]))
            )
        elif kind == "gsub":
            _need(body, {"field", "pattern", "replacement"}, set(), "gsub")
            f = _field(out, body, "gsub")
            out = out.withColumn(
                f,
                F.regexp_replace(
                    F.col(f), str(body["pattern"]),
                    str(body["replacement"]),
                ),
            )
        elif kind == "convert":
            _need(body, {"field", "type"}, {"ignore_failure"}, "convert")
            f = _field(out, body, "convert")
            t = _CONVERT_TYPES.get(str(body["type"]))
            if t is None:
                raise _err(
                    f"convert type {body['type']!r} "
                    f"(supported: {sorted(_CONVERT_TYPES)})"
                )
            if bool(body.get("ignore_failure", False)):
                out = out.withColumn(f, F.col(f).try_cast(t))
            else:
                out = out.withColumn(f, F.col(f).cast(t))
        else:
            raise _err(f"processor {kind!r}")
    return out


__all__ = ["simulate_pipeline"]
