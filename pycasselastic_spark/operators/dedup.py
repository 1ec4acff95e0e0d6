"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.

Design for 100 TB:
  * exact dedup is a single hash-shuffle with map-side combine;
  * MinHash-LSH never compares all pairs — signatures are computed
    per-row (narrow), candidates come from an equi-join on band keys
    (shuffle keyed by band value, skew-safe under AQE), and only
    candidates pay the exact-Jaccard verification;
  * SimHash blocking uses the pigeonhole principle (hamming <= t means
    at least one of t+1 fingerprint chunks matches exactly), so the
    candidate join is again a plain equi-join — no cross product;
  * hash functions are md5-based so a DuckDB oracle can replay them
    bit-for-bit (xxhash64 would be faster JVM-side but has no
    cross-engine twin; swap via ``hash_fn`` if oracle parity is not
    needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# shared expressions
# --------------------------------------------------------------------------


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-tokenized text
    column. Empty array when the document has fewer than ``n`` words
    (Spark's ``sequence(1, 0)`` would count *down*, so guard it)."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.split(c, " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + j) for j in range(n)]
    )
    return F.when(
        F.size(ws) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays.
    int/int division — bit-identical across engines."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def minhash_signature(sh: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: per hash function h, the minimum md5 of
    shingle||'#h'. String-min over hex digests == numeric min over the
    corresponding 128-bit values, and is identical in any engine."""
    return [
        F.array_min(F.transform(sh, lambda s, h=h: F.md5(F.concat(s, F.lit(f"#{h}")))))
        for h in range(num_hashes)
    ]


def token_hash32(w: Column) -> Column:
    """Deterministic 32-bit token hash both engines can compute:
    first 8 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash over distinct whitespace tokens: bit j of the
    fingerprint is 1 iff the sum over tokens of (+1 if bit j of the
    token hash is set else -1) is >= 0. Bits are extracted with
    floor-divide/mod (not shifts) so the SQL oracle can mirror the
    arithmetic exactly."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(c, " "))
    hashes = F.transform(toks, token_hash32)
    bit_vote = lambda h, j: F.when(  # noqa: E731
        F.pmod(F.floor(h / F.pow(F.lit(2.0), j)).cast("long"), 2) == 1, 1
    ).otherwise(-1)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(31)), lambda j: bit_vote(h, j)),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda j: F.when(
                F.element_at(counts, j + 1) >= 0,
                F.pow(F.lit(2.0), j).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# --------------------------------------------------------------------------
# operators
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per identical content (the one with the
    smallest ``order_col``). Hash-shuffle on the content digest with
    map-side partial aggregation — the canonical exact dedup at scale."""
    digest = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    payload = F.struct(F.col(order_col), *[F.col(c) for c in df.columns if c != order_col])
    keep = (
        df.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(F.min_by(F.struct(*df.columns), F.col(order_col)).alias("_row"))
        .select([F.col(f"_row.{c}").alias(c) for c in df.columns])
    )
    _ = payload
    return keep


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard near-dup detection (the brute
    -force baseline; use ``minhash_lsh_pairs`` at scale). Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = df.select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh"))
    a = sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 24,
    band_rows: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + LSH near-dup pairs: shingle -> minhash signature ->
    band buckets -> equi-join candidates -> exact-Jaccard verify.

    Same output contract as ``ngram_jaccard_pairs`` but with no
    all-pairs comparison: candidate generation is an equi-join on
    (band index, band key). With 24 hashes in 12 bands of 2 rows, a
    pair at Jaccard 0.8 is missed with probability (1-0.64)^12 ~= 5e-6;
    tune bands/rows to the target threshold.
    """
    num_bands = num_hashes // band_rows
    sh = df.select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh"))
    sig = minhash_signature(F.col("_sh"), num_hashes)
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *sig[b * band_rows : (b + 1) * band_rows]))
            for b in range(num_bands)
        ]
    )
    banded = sh.select("_id", F.posexplode(bands).alias("_band_idx", "_band_key"))
    left = banded.select(
        F.col("_id").alias("doc_a"), "_band_idx", "_band_key"
    )
    right = banded.select(
        F.col("_id").alias("doc_b"), "_band_idx", "_band_key"
    )
    candidates = (
        left.join(right, ["_band_idx", "_band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_a = sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"))
    sh_b = sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"))
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with pigeonhole blocking: fingerprints are
    split into ``max_hamming + 1`` chunks; any pair within the hamming
    budget must agree exactly on at least one chunk, so candidates come
    from an equi-join on (chunk index, chunk value) — exact, not
    probabilistic. Output: (doc_a, doc_b, hamming)."""
    n_chunks = max_hamming + 1
    chunk_bits = 32 // n_chunks  # 8 bits per chunk for the default
    fp = df.select(F.col(id_col).alias("_id"), simhash32(text_col).alias("fingerprint"))
    chunk = lambda c: F.pmod(  # noqa: E731
        F.floor(F.col("fingerprint") / F.pow(F.lit(2.0), c * chunk_bits)).cast("long"),
        F.lit(2 ** chunk_bits),
    )
    chunks = F.array(*[chunk(c) for c in range(n_chunks)])
    blocked = fp.select(
        "_id", "fingerprint", F.posexplode(chunks).alias("_chunk_idx", "_chunk_val")
    )
    left = blocked.select(
        F.col("_id").alias("doc_a"),
        F.col("fingerprint").alias("_fa"),
        "_chunk_idx",
        "_chunk_val",
    )
    right = blocked.select(
        F.col("_id").alias("doc_b"),
        F.col("fingerprint").alias("_fb"),
        "_chunk_idx",
        "_chunk_val",
    )
    return (
        left.join(right, ["_chunk_idx", "_chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding near-dup pairs by cosine similarity (brute force —
    the verification baseline; the LSH-bucketed scale path lives in
    operators/similarity.py). Dot products run in sequential double
    precision (bit-identical to the SQL oracle)."""
    from pycasselastic_spark.operators.similarity import cosine

    a = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
