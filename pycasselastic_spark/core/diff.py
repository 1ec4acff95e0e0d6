"""Anti-entropy store comparison: find where two replicas of a table
disagree without joining the full tables.

The reference's only cross-store comparison is the test harness's
driver-side dict probe (``tests/testSyncClass.py:286-331`` ``checkSync``:
collect both stores, compare field by field) — O(n) driver memory and
unusable beyond test sizes. The engine rebuilds it in two stages, the
same shape Cassandra's repair trees / DynamoDB anti-entropy use:

1. **Bucket digests** (Merkle-leaf equivalent): each row folds to a
   60-bit digest built from PER-COLUMN md5 hashes (so payload values
   containing the field separator, or NULLs shifting position, cannot
   forge another row's digest — see ``row_digest``). Per id-bucket the
   digests combine through TWO independent order-free aggregates — a
   ``bit_xor`` and an exact decimal sum folded mod 2^60 — plus a row
   count. Each store collapses to at most ``n_buckets`` rows map-side;
   the shuffle carries the digest table, not the data. Two 100 TB
   replicas compare by equi-joining a few thousand digest rows.
2. **Pruned row diff**: only buckets whose (xor, sum, count) triple
   disagrees are re-read; the row-level full-outer join runs on that
   filtered subset (predicate pushdown prunes the scan) and classifies
   each id as ``missing_in_a`` / ``missing_in_b`` / ``payload_differs``.

Collision analysis: XOR alone cancels PAIRS of identical digests
(A={r,r,s} vs B={s,t,t} agrees on xor and count), which duplicate-id
replicas can hit in practice — the sum channel breaks exactly that
class, since the sums differ unless r == t. A diff can now be masked
only if two different digest multisets agree on xor AND sum AND count
simultaneously — adversarially constructible against md5, vanishingly
unlikely for drift (and a different ``n_buckets`` re-partition breaks
any accidental pairing). All hashing is md5-derived so a DuckDB oracle
replays digests, bucket pruning and the final diff bit-exactly.
Adversarial separator/NULL-shift/duplicate-pair cases are pinned in
``tests/test_diff.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(
    id_col: Column, payload_cols: list[Column], hash_fn: str = "md5"
) -> Column:
    """Digest of (id, payload), forgery-safe in either hash family.

    ``hash_fn="md5"`` (default): 60-bit digest — first 15 md5 hex chars
    of the '|'-joined PER-COLUMN md5 hashes, base-16. Each column is
    md5-hashed independently before the join, so a payload value
    containing the separator cannot forge a field boundary — ('a|b','c')
    and ('a','b|c') digest differently because md5 hex never contains
    '|'. A NULL column hashes to the sentinel 'n' (not a possible md5
    output), so NULL position is significant: ('x', NULL, 'y') and
    ('x', 'y', NULL) digest differently too. md5 is the DuckDB-
    replayable family — the oracle recomputes digests bit-for-bit.

    ``hash_fn="xxhash64"``: full-width 64-bit digest via per-column
    ``xxhash64`` folded positionally by one outer ``xxhash64`` — the
    PRODUCTION family. The md5 path pays 4 md5 calls per row; on wide
    256-char payloads the quiet-host curve (SCALING.md) is md5
    5.9/4.7/10.5 s vs xxhash64 3.0/2.5/3.4 s at 2M/8M/32M — a 3.1x
    digest speedup at 32M. Forgery safety holds structurally: each
    column is its own
    fixed-width argument to the outer hash (no separator to inject),
    and a NULL column's inner hash is the xxhash seed constant, so
    NULL position shifts the outer fold (a non-null value colliding
    with the seed is a 2^-64 event). Not DuckDB-replayable — use md5
    where an independent oracle must verify the digests.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(*[F.xxhash64(c) for c in (id_col, *payload_cols)])
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}: use 'md5' or 'xxhash64'")
    parts = [
        F.coalesce(F.md5(c.cast("string")), F.lit("n"))
        for c in (id_col, *payload_cols)
    ]
    return F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast("long")


def bucket_digests(
    df: DataFrame,
    id_col: str,
    payload_cols: list[str],
    n_buckets: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """``(bucket, xor_digest, sum_digest, n_rows)`` — at most
    ``n_buckets`` rows.

    bit_xor is commutative/associative with no overflow, so partial
    aggregation runs map-side and the result is independent of row
    order and partitioning — the property that makes digests of two
    independently-partitioned replicas comparable.

    ``sum_digest`` is a second, independent combinator over the same
    row digests: XOR cancels PAIRS of identical rows (A={r,r,s} vs
    B={s,t,t} has equal xor_digest AND equal n_rows), but their sums
    differ unless r == t — so duplicate-id replicas can't silently
    cancel. Summed as decimal(38,0) (exact, overflow-free up to
    ~10^38/2^60 ≈ 8.6e19 rows per bucket) then folded mod 2^60 back
    to a long; both engines compute it identically.
    """
    digest = row_digest(
        F.col(id_col), [F.col(c) for c in payload_cols], hash_fn
    )
    return (
        df.select(
            F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
            digest.alias("_d"),
        )
        .groupBy("bucket")
        .agg(
            F.bit_xor("_d").alias("xor_digest"),
            F.pmod(
                F.sum(F.col("_d").cast("decimal(38,0)")),
                F.lit(1 << 60).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("sum_digest"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    payload_cols: list[str],
    n_buckets: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """Row-level differences between two replicas, computed only inside
    buckets whose digests disagree.

    Returns ``(id_col, diff_status)`` with status in
    ``missing_in_a`` / ``missing_in_b`` / ``payload_differs``.

    The bucket prune is the scale lever: agreement is proven by the
    digest join alone (n_buckets rows per side), and the expensive
    full-outer row join only reads the disagreeing slice — for typical
    drift (a few bad buckets) that is a small fraction of either table,
    and the bucket predicate pushes down to the scan.

    Precondition: ``id_col`` is unique per replica (the keyed-replica
    use case — the reference stores are id-keyed Cassandra/ES tables,
    so a replica can't hold two rows for one id). Bucket-level masking
    by duplicates is already ruled out without the precondition (the
    xor/sum digest pair can't both cancel), but the ROW-level phase
    classifies per id: duplicate ids would make the full-outer join
    many-to-many and the per-id status ambiguous.
    """
    da = bucket_digests(a, id_col, payload_cols, n_buckets, hash_fn)
    db = bucket_digests(b, id_col, payload_cols, n_buckets, hash_fn)
    bad = (
        da.join(db, "bucket", "full_outer")
        .filter(
            ~(
                da["xor_digest"].eqNullSafe(db["xor_digest"])
                & da["sum_digest"].eqNullSafe(db["sum_digest"])
                & da["n_rows"].eqNullSafe(db["n_rows"])
            )
        )
        .select("bucket")
    )
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long")
    digest = row_digest(F.col(id_col), [F.col(c) for c in payload_cols], hash_fn)
    slim_a = (
        a.withColumn("_bucket", bucket)
        .join(F.broadcast(bad), F.col("_bucket") == bad["bucket"], "left_semi")
        .select(F.col(id_col).alias("_id"), digest.alias("_da"))
    )
    slim_b = (
        b.withColumn("_bucket", bucket)
        .join(F.broadcast(bad), F.col("_bucket") == bad["bucket"], "left_semi")
        .select(F.col(id_col).alias("_id"), digest.alias("_db"))
    )
    joined = slim_a.join(slim_b, "_id", "full_outer")
    # rows with equal payloads inside a flagged bucket are NOT diffs
    return joined.filter(~F.col("_da").eqNullSafe(F.col("_db"))).select(
        F.col("_id").alias(id_col),
        F.when(F.col("_db").isNull(), F.lit("missing_in_b"))
        .when(F.col("_da").isNull(), F.lit("missing_in_a"))
        .otherwise(F.lit("payload_differs"))
        .alias("diff_status"),
    )
