"""Expression combinators.

``let`` is the one that matters at scale: Spark has no LET binding, so
an expression referenced N times in a projection (or inside a
higher-order-function lambda) is INLINED N times by project-collapse,
and higher-order lambdas evaluate interpreted — each inlined copy
re-executes per element. A shingle generator that mentions
``split(text, ' ')`` inside its per-position lambda re-splits the
document once per position per n-gram slot (measured 8x wall-clock on
the shingle pipeline at sf0.1). Binding the value as a lambda variable
evaluates it exactly once per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and bind it as a variable inside
    ``body`` — Spark's missing LET, expressed as a ``transform`` over a
    one-element array (the lambda variable is a materialized value
    during evaluation, so every reference inside ``body`` reuses it).

    Use whenever a non-trivial expression would otherwise appear more
    than once in a lambda or projection — tokenizations, parsed JSON,
    normalized vectors.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
