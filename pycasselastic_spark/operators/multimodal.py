"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no real codec libraries (PIL/librosa/ffmpeg), so the
*decode* step supports a deterministic fake wire format ("FIMG"/"FAUD"/
"FVID" headers, see ``synthesize_media``) and raises
``NotImplementedError`` for compressed formats — the Spark-side
contract (schema, binary transport, Arrow batch iteration,
partition-parallel execution, output schemas) is real and tested.
Swapping in a real decoder is a per-batch function change, not a
pipeline change — demonstrated at the bottom of this module by a REAL
pure-numpy codec for PPM (P6), a public uncompressed format whose spec
needs no library: parse, channel statistics, nearest-neighbor resize,
re-encode, all value-oracled byte-for-byte.

Scale notes: mapInPandas streams Arrow batches — content bytes never
materialize as Python lists row-by-row; partition-parallel with no
shuffle (narrow transformation). At 100 TB the media table would be
partitioned by (kind, date) so decode jobs prune to the modality they
need; metadata aggregations never touch the binary column at all
(column pruning keeps the scan light — asserted in tests).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media derived from the documents table: doc_id
    becomes media_id; kind cycles image/audio/video; content is a
    self-describing fake binary (magic + dims + payload bytes derived
    from the text md5). Pure column expressions — the binary is built
    JVM-side, reproducibly, with no RNG."""
    from pycasselastic_spark.sources.corpus import load_table

    docs = load_table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    width = (F.col("doc_id") % 16 + 4).cast("int")
    height = (F.col("doc_id") % 8 + 2).cast("int")
    n_frames = (F.col("doc_id") % 5 + 1).cast("int")
    payload = F.repeat(F.substring(F.md5("text"), 1, 8), 8)  # 64 payload bytes
    magic = (
        F.when(kind == "image", "FIMG").when(kind == "audio", "FAUD").otherwise("FVID")
    )
    header = F.concat_ws(
        "|", magic, width.cast("string"), height.cast("string"), n_frames.cast("string")
    )
    content = F.encode(F.concat(header, F.lit(";"), payload), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.lit(16000).alias("sample_rate"),
            n_frames.alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def _parse_fake(content: bytes) -> dict:
    """Decode the fake wire format. Real formats are the documented
    stub boundary."""
    if content is None:
        return {"width": None, "height": None, "n_frames": None, "payload": b""}
    head, _, payload = bytes(content).partition(b";")
    parts = head.split(b"|")
    if len(parts) != 4 or parts[0] not in (b"FIMG", b"FAUD", b"FVID"):
        raise NotImplementedError(
            "real codec decode is stubbed in this environment; only the "
            "FIMG/FAUD/FVID fake wire format is supported"
        )
    return {
        "width": int(parts[1]),
        "height": int(parts[2]),
        "n_frames": int(parts[3]),
        "payload": payload,
    }


FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "payload_bytes int, mean_byte double"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    Output: per-media decoded dims and payload statistics. The binary
    column is consumed inside the batch iterator and not carried
    forward — downstream stages shuffle only small feature rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [_parse_fake(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": [p["width"] for p in parsed],
                    "height": [p["height"] for p in parsed],
                    "n_frames": [p["n_frames"] for p in parsed],
                    "payload_bytes": [len(p["payload"]) for p in parsed],
                    "mean_byte": [
                        (sum(p["payload"]) / len(p["payload"])) if p["payload"] else 0.0
                        for p in parsed
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """'Resize' images: rewrites the fake header dims and truncates/pads
    the payload to out_w*out_h/8 bytes — a stand-in with the exact
    shape of a real resize (binary in, binary out, new meta)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for content in pdf["content"]:
                p = _parse_fake(content)
                payload = p["payload"][: max(1, out_w * out_h // 8)]
                head = b"|".join(
                    [b"FIMG", str(out_w).encode(), str(out_h).encode(), b"1"]
                )
                out.append(head + b";" + payload)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "content": out}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema="media_id long, content binary"
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for videos: emits one output row per kept frame
    (frame payload = the frame's slice of the fake payload) — a 1:N
    mapInPandas, the shape of real frame extraction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, data = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                p = _parse_fake(content)
                n = p["n_frames"] or 0
                if n <= 0:
                    continue
                size = max(1, len(p["payload"]) // n)
                for f in range(0, n, every_k):
                    ids.append(mid)
                    frames.append(f)
                    data.append(p["payload"][f * size : (f + 1) * size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": frames, "frame": data}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema="media_id long, frame_idx int, frame binary"
    )


AUDIO_RESAMPLE_SCHEMA = (
    "media_id long, out_rate int, orig_bytes int, n_bytes int, "
    "resampled_md5 string"
)


def resample_audio(
    media: DataFrame, factor: int = 2, base_rate: int = 16000
) -> DataFrame:
    """Decimation 'resample' for audio media: keep every ``factor``-th
    payload byte and report the new rate + a digest of the kept bytes.
    Same Arrow-batch shape as a real resampler (scipy/librosa would
    replace the per-batch kernel, nothing else changes); 1:1
    mapInPandas, binary consumed inside the batch, only small feature
    rows leave the stage."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, orig, kept_n, digests = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                p = _parse_fake(content)
                kept = p["payload"][::factor]
                ids.append(mid)
                orig.append(len(p["payload"]))
                kept_n.append(len(kept))
                digests.append(hashlib.md5(kept).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_rate": [base_rate // factor] * len(ids),
                    "orig_bytes": orig,
                    "n_bytes": kept_n,
                    "resampled_md5": digests,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema=AUDIO_RESAMPLE_SCHEMA
    )


_ = struct  # (struct available for real-codec implementations)


# ---------------------------------------------------------------------------
# Real public-format codec: PPM (P6, the Netpbm binary RGB format).
#
# PPM needs no codec library — the format is a whitespace-delimited
# ASCII header followed by raw RGB bytes — so the decode step here is a
# REAL decoder for a real public format, not the fake wire format: it
# parses arbitrary conforming P6 files (comments, flexible whitespace)
# per the published Netpbm spec. Compressed formats (JPEG/PNG/audio/
# video) remain the documented environment stub in _parse_fake above.
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb) -> bytes:
    """Serialize an (height, width, 3) uint8 array as binary PPM (P6)."""
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.shape != (height, width, 3):
        raise ValueError(f"expected shape {(height, width, 3)}, got {arr.shape}")
    return b"P6\n%d %d\n255\n" % (width, height) + arr.tobytes()


def decode_ppm(content: bytes):
    """Parse a binary PPM (P6): returns (width, height, ndarray[h,w,3]).

    Implements the published header grammar: 'P6', then width, height,
    maxval as ASCII decimals separated by whitespace, with '#' comments
    allowed between tokens, then ONE whitespace byte, then
    width*height*3 raw bytes (maxval <= 255)."""
    import numpy as np

    buf = bytes(content)
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM (bad magic)")
    pos = 2
    tokens = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported maxval {maxval} (only 8-bit supported)")
    n = width * height * 3
    data = buf[pos : pos + n]
    if len(data) != n:
        raise ValueError(f"PPM raster truncated: want {n} bytes, got {len(data)}")
    return width, height, np.frombuffer(data, dtype=np.uint8).reshape(height, width, 3)


def resize_nearest(rgb, out_w: int, out_h: int):
    """Nearest-neighbor resize with pure integer index mapping
    (src = (dst * src_extent) // dst_extent) — exactly replayable in
    integer SQL, which is what lets the resize output be value-oracled
    byte for byte."""
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def synthesize_ppm_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic real PPM (P6) images derived from the documents
    table, built with pure column expressions: per-doc dims (4..19 x
    2..9) and a raster of width*height*3 bytes taken from the repeated
    md5 hex of the text (unhex -> raw bytes). Output:
    (media_id, width, height, content binary)."""
    from pycasselastic_spark.sources.corpus import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 16 + 4).cast("int")
    h = (F.col("doc_id") % 8 + 2).cast("int")
    # 19*9*3 = 513 raster bytes max = 1026 hex chars; repeat(md5,33) = 1056
    raster = F.unhex(
        F.expr("substring(repeat(md5(text), 33), 1, (doc_id % 16 + 4) "
               "* (doc_id % 8 + 2) * 6)")
    )
    header = F.concat_ws(
        "", F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        w.alias("width"),
        h.alias("height"),
        F.concat(F.encode(header, "utf-8"), raster).alias("content"),
    )


PPM_STATS_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double"
)


def ppm_channel_stats(media: DataFrame) -> DataFrame:
    """REAL decode + per-channel statistics over Arrow batches: parse
    each P6 file with decode_ppm and report per-channel means (exact
    integer sums divided in double — cross-engine reproducible)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, arr = decode_ppm(content)
                n = w * h
                sums = arr.reshape(-1, 3).astype(np.int64).sum(axis=0)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                mr.append(float(sums[0]) / n)
                mg.append(float(sums[1]) / n)
                mb.append(float(sums[2]) / n)
            yield pd.DataFrame(
                {
                    "media_id": ids, "width": ws, "height": hs,
                    "mean_r": mr, "mean_g": mg, "mean_b": mb,
                }
            )

    return media.mapInPandas(batches, schema=PPM_STATS_SCHEMA)


def ppm_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL decode -> nearest-neighbor resize -> re-encode as P6.
    Output: (media_id, width, height, content) with the resized file."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, _, arr = decode_ppm(content)
                ids.append(mid)
                outs.append(encode_ppm(out_w, out_h, resize_nearest(arr, out_w, out_h)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "content": outs,
                }
            )

    return media.mapInPandas(
        batches, schema="media_id long, width int, height int, content binary"
    )
