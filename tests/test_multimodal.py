"""Multimodal plumbing tests: deterministic fake decode through real
Arrow/mapInPandas machinery, 1:N frame explosion, stub boundary, and
binary-column pruning at the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pycasselastic_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.synthesize_media(spark, sf_dir).cache()


def test_feature_extraction_deterministic(spark, media):
    feats = {r["media_id"]: r.asDict() for r in M.extract_features(media).collect()}
    raw = {r["media_id"]: r.asDict() for r in media.collect()}
    assert len(feats) == len(raw) > 0
    for mid, f in feats.items():
        assert f["width"] == raw[mid]["meta"]["width"]
        assert f["height"] == raw[mid]["meta"]["height"]
        assert f["payload_bytes"] == 64  # 8-char md5 prefix repeated 8x
        assert 0 <= f["mean_byte"] <= 255


def test_resize_rewrites_header(spark, media):
    out = M.resize_images(media, 8, 4).collect()
    assert len(out) > 0
    for r in out:
        assert bytes(r["content"]).startswith(b"FIMG|8|4|1;")


def test_frame_sample_counts(spark, media):
    vids = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect()
            if r["kind"] == "video"}
    frames = M.sample_frames(media, every_k=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_media) == set(vids)
    for mid, idxs in by_media.items():
        expected = list(range(0, vids[mid], 2))
        assert sorted(idxs) == expected


def test_real_codec_is_stubbed(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG\r\n..."))],
        "media_id long, kind string, content binary",
    )
    with pytest.raises(Exception) as exc:
        M.extract_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_binary_column_pruned_for_meta_queries(spark, media, tmp_path):
    """A metadata-only query against the media table must not read the
    binary column from parquet (column pruning)."""
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    meta_only = spark.read.parquet(path).select("media_id", "meta.width")
    from pycasselastic_spark.plans import tuning
    plan = tuning.physical_plan(meta_only)
    assert "content" not in plan


def test_resample_audio_decimates_payload(spark):
    media = M.synthesize_media(spark, "/root/testdata/sf0.001")
    out = {r["media_id"]: r for r in M.resample_audio(media, factor=2).collect()}
    assert out  # audio rows exist
    import hashlib

    for r in media.filter("kind = 'audio'").limit(5).collect():
        p = M._parse_fake(r["content"])
        expect = p["payload"][::2]
        got = out[r["media_id"]]
        assert got["orig_bytes"] == len(p["payload"])
        assert got["n_bytes"] == len(expect)
        assert got["resampled_md5"] == hashlib.md5(expect).hexdigest()
        assert got["out_rate"] == 8000


# --- real PPM (P6) codec ---


def test_ppm_roundtrip_identity():
    import numpy as np

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, out = M.decode_ppm(M.encode_ppm(9, 5, arr))
    assert (w, h) == (9, 5)
    assert (out == arr).all()


def test_ppm_header_grammar_comments_and_whitespace():
    import numpy as np

    raster = bytes(range(2 * 1 * 3))
    buf = b"P6 # comment after magic\n# full line\n 2\t1 #dims done\n255\n" + raster
    w, h, arr = M.decode_ppm(buf)
    assert (w, h) == (2, 1)
    assert arr.tobytes() == raster
    _ = np


def test_ppm_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="magic"):
        M.decode_ppm(b"P5\n1 1\n255\nxxx")
    with pytest.raises(ValueError, match="truncated"):
        M.decode_ppm(b"P6\n4 4\n255\nshort")
    with pytest.raises(ValueError, match="maxval"):
        M.decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_ppm_resize_nearest_mapping():
    import numpy as np

    arr = np.arange(6 * 10 * 3, dtype=np.uint8).reshape(6, 10, 3)
    out = M.resize_nearest(arr, 5, 3)
    assert out.shape == (3, 5, 3)
    for y in range(3):
        for x in range(5):
            assert (out[y, x] == arr[(y * 6) // 3, (x * 10) // 5]).all()


def test_ppm_pipeline_decodes_synthesized_files(spark, sf_dir):
    media = M.synthesize_ppm_media(spark, sf_dir)
    stats = M.ppm_channel_stats(media.select("media_id", "content")).collect()
    raw = {r["media_id"]: r for r in media.collect()}
    assert len(stats) == len(raw) > 0
    for r in stats:
        assert r["width"] == raw[r["media_id"]]["width"]
        assert r["height"] == raw[r["media_id"]]["height"]
        assert 0.0 <= r["mean_r"] <= 255.0
    resized = M.ppm_resize(media.select("media_id", "content"), 8, 4).collect()
    for r in resized:
        w, h, arr = M.decode_ppm(bytes(r["content"]))
        assert (w, h) == (8, 4) and arr.shape == (4, 8, 3)
