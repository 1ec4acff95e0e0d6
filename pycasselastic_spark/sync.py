"""Daemon entry point: ``python -m pycasselastic_spark.sync config.json``.

The reference ships a long-running process (``SyncCassElastic.py:17-67``):
parse a JSON config, write a pid file, then loop forever running one
sync cycle per ``period`` minutes, sleeping the remainder of each
period. This is that surface on the Spark engine: the same config shape
(top-level ``period`` + ``syncs`` list, config_ex.json), the same
fixed-period cadence, a pid file on request — with the cycle itself
delegated to :func:`pycasselastic_spark.pipeline.sync.run_cycle`
(watermarked half-open windows + idempotent LWW merge, so a crashed or
repeated cycle converges instead of duplicating).

Store resolution per side of a spec (``options.format``):

- ``snapshot`` (default) — a :class:`SnapshotStore` directory (A/B
  parquet generations + atomic ``CURRENT`` pointer): the file-backed
  stand-in for a store with native upserts. Read = current generation,
  upsert = argmax merge into the next generation.
- ``cassandra`` / ``elasticsearch`` — the public Spark connectors via
  :mod:`pycasselastic_spark.sources.registry`, upserting with
  ``writetime`` / external-versioning options (no jars in this
  container; exercised by contract tests only).
- plain file formats (``parquet``/``csv``/``json``/``orc``) — valid as
  read-only sources; refused as sinks (no in-place upsert exists —
  use ``snapshot``).

For a Spark-native periodic trigger without a driver loop, see
:func:`pycasselastic_spark.streaming.sync.start_streaming_sync`.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("pycasselastic_spark.sync")


def _build_stores(
    spark: SparkSession, spec
) -> tuple[Callable[[], DataFrame], Callable[[DataFrame], None]]:
    """Resolve both sides of a spec to (load, sink) callables."""
    from pycasselastic_spark.sources.registry import (
        TableRef,
        read_table,
        write_table,
    )
    from pycasselastic_spark.streaming.sync import SnapshotStore

    sides = []
    for st in (spec.left, spec.right):
        fmt = st.options.get("format", "snapshot")
        options = {k: v for k, v in st.options.items() if k != "format"}
        if fmt == "snapshot":
            store = SnapshotStore(
                spark, st.table, spec.id_col, spec.version_col, spec.tiebreak_cols
            )

            def read(store=store, table=st.table) -> DataFrame:
                current = store.current()
                if current is None:
                    raise ValueError(
                        f"snapshot store {table!r} is empty — seed it first "
                        "(SnapshotStore.merge)"
                    )
                return current

            sides.append((read, store.merge))
        elif fmt in ("cassandra", "elasticsearch"):
            ref = TableRef(fmt, st.table, options)
            sides.append(
                (
                    lambda ref=ref: read_table(spark, ref),
                    lambda df, ref=ref: write_table(
                        df,
                        ref,
                        mode="append",
                        id_col=spec.id_col,
                        version_col=spec.version_col,
                    ),
                )
            )
        else:
            ref = TableRef(fmt, st.table, options)

            def no_sink(df: DataFrame, fmt=fmt) -> None:
                raise ValueError(
                    f"plain file format {fmt!r} has no in-place upsert; "
                    "use format 'snapshot' for file-backed sinks"
                )

            sides.append((lambda ref=ref: read_table(spark, ref), no_sink))
    return sides[0], sides[1]


def run_daemon(
    config: dict,
    spark: SparkSession,
    watermark_file: str,
    max_cycles: int | None = None,
) -> int:
    """Run sync cycles at the configured period until interrupted (or
    ``max_cycles`` cycles for tests/one-shots). Returns the number of
    cycles in which every spec succeeded."""
    from pycasselastic_spark.core.incremental import WatermarkStore
    from pycasselastic_spark.core.specs import parse_spec
    from pycasselastic_spark.core.timing import timed
    from pycasselastic_spark.pipeline.sync import run_cycle

    specs = [parse_spec(s) for s in config.get("syncs", config.get("sync", []))]
    if not specs:
        raise ValueError("config has no 'syncs' entries")
    period_s = float(config.get("period", 1)) * 60  # minutes, like the reference
    watermarks = WatermarkStore(watermark_file)
    stores = {spec.name: _build_stores(spark, spec) for spec in specs}

    def load(spec):
        (read_l, _), (read_r, _) = stores[spec.name]
        return read_l(), read_r()

    def sink(spec, result):
        (_, sink_l), (_, sink_r) = stores[spec.name]
        # Bidirectional convergence: both stores receive the merged
        # winners; losers are superseded by version (snapshot argmax /
        # connector external versioning), so no physical delete leg.
        sink_l(result.winners)
        sink_r(result.winners)

    ok_cycles = 0
    cycle = 0
    start = time.time()
    while True:
        cycle += 1
        with timed(f"sync cycle {cycle}"):
            results = run_cycle(specs, load, sink, watermarks)
        for r in results:
            log.info("  %s: %s", r.name, "ok" if r.ok else f"FAILED: {r.error}")
        if all(r.ok for r in results):
            ok_cycles += 1
        if max_cycles is not None and cycle >= max_cycles:
            return ok_cycles
        # sleep to the next period boundary, exactly like the reference
        # (SyncCassElastic.py:46-47)
        time.sleep(period_s - ((time.time() - start) % period_s))


def read_pid(pid_file: str) -> int | None:
    """The pid recorded in ``pid_file``, or None if absent/unparsable."""
    try:
        with open(pid_file, encoding="utf-8") as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def daemon_running(pid: int) -> bool:
    """True if a process with ``pid`` exists (signal 0 probe — the same
    check the reference's status.sh does with kill -0)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    return True


def daemon_status(pid_file: str) -> int:
    """Operational parity with the reference's ``status.sh``: report
    whether the daemon whose pid is recorded in ``pid_file`` is
    running. Exit code 0 = running, 1 = not."""
    pid = read_pid(pid_file)
    if pid is None:
        print(f"not running (no pid file at {pid_file})")
        return 1
    if daemon_running(pid):
        print(f"running (pid {pid})")
        return 0
    print(f"not running (stale pid file {pid_file}, pid {pid})")
    return 1


def daemon_stop(pid_file: str) -> int:
    """Operational parity with the reference's ``kill.sh``: SIGTERM the
    daemon recorded in ``pid_file`` and remove the pid file. Exit code
    0 = signalled (or already gone, pid file cleaned), 1 = no pid
    file."""
    import signal

    pid = read_pid(pid_file)
    if pid is None:
        print(f"nothing to stop (no pid file at {pid_file})")
        return 1
    try:
        os.kill(pid, signal.SIGTERM)
        print(f"sent SIGTERM to pid {pid}")
    except ProcessLookupError:
        print(f"pid {pid} already gone; removing stale pid file")
    try:
        os.remove(pid_file)
    except OSError:
        pass
    return 0


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m pycasselastic_spark.sync",
        description="Periodic bidirectional LWW sync between two stores "
        "(the reference SyncCassElastic daemon on Spark).",
    )
    parser.add_argument("config", nargs="?", default=None,
                        help="JSON config: {period, syncs:[...]} "
                        "(see the reference config_ex.json); not needed "
                        "with --status/--stop")
    parser.add_argument("--once", action="store_true",
                        help="run a single cycle and exit")
    parser.add_argument("--max-cycles", type=int, default=None,
                        help="stop after N cycles (default: run forever)")
    parser.add_argument("--watermark-file", default=None,
                        help="watermark path (default: <config dir>/watermark.json)")
    parser.add_argument("--pid-file", default=None,
                        help="write the process id here on startup")
    parser.add_argument("--status", action="store_true",
                        help="report whether the daemon recorded in "
                        "--pid-file is running, then exit (reference "
                        "status.sh)")
    parser.add_argument("--stop", action="store_true",
                        help="SIGTERM the daemon recorded in --pid-file "
                        "and remove the pid file, then exit (reference "
                        "kill.sh)")
    args = parser.parse_args(argv)

    if args.status or args.stop:
        if not args.pid_file:
            parser.error("--status/--stop require --pid-file")
        return daemon_status(args.pid_file) if args.status else daemon_stop(
            args.pid_file
        )
    if args.config is None:
        parser.error("config is required unless --status/--stop is given")

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )
    with open(args.config, encoding="utf-8") as fh:
        config = json.load(fh)
    watermark_file = args.watermark_file or os.path.join(
        os.path.dirname(os.path.abspath(args.config)), "watermark.json"
    )
    if args.pid_file:
        with open(args.pid_file, "w", encoding="utf-8") as fh:
            fh.write(str(os.getpid()))

    owns_spark = spark is None
    if owns_spark:
        from pycasselastic_spark.session import get_spark

        spark = get_spark(app_name="pycasselastic-sync")
    try:
        max_cycles = 1 if args.once else args.max_cycles
        ok = run_daemon(config, spark, watermark_file, max_cycles=max_cycles)
        return 0 if ok else 1
    except KeyboardInterrupt:
        log.info("interrupted — exiting")
        return 0
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
