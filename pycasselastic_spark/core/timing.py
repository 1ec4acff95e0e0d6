"""Duration instrumentation — the reference's ``@timeit`` decorator
(``/root/reference/utils.py:38-55``) was its only observability: every
sync leg logged how long it took. Same surface here, engine-agnostic:
a decorator for named functions and a context manager for ad-hoc legs,
both logging ``<name> took <sec>`` at INFO.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Iterator
from contextlib import contextmanager

log = logging.getLogger("pycasselastic_spark.timing")


@contextmanager
def timed(name: str) -> Iterator[None]:
    """Log the wall-clock duration of the enclosed block."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.info("%s took %.3f s", name, time.perf_counter() - t0)


def timeit(fn):
    """Decorator twin of :func:`timed` (reference utils.py:38-55)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with timed(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper
