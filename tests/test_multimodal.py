"""Multimodal column plumbing (ops/multimodal.py): schemas, batch flow,
determinism of the stubbed codecs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from groonga_spark.ops.multimodal import (
    extract_audio_features,
    extract_image_features,
    resize_image,
    sample_video_frames,
    to_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode() * (i + 1)) for i in range(1, 6)],
        "id long, blob binary",
    )
    return to_media(df, "blob", "id", "image", "application/octet-stream")


class TestMultimodal:
    def test_metadata_columns(self, media):
        rows = {r["media_id"]: r for r in media.collect()}
        assert set(rows) == {1, 2, 3, 4, 5}
        r = rows[2]
        payload = b"payload-2" * 3
        assert bytes(r["payload"]) == payload
        assert r["n_bytes"] == len(payload)
        assert r["sha"] == hashlib.sha256(payload).hexdigest()
        assert r["kind"] == "image"

    def test_image_features_deterministic(self, media):
        a = {r["media_id"]: (r["width"], r["height"], tuple(r["features"]))
             for r in extract_image_features(media).collect()}
        b = {r["media_id"]: (r["width"], r["height"], tuple(r["features"]))
             for r in extract_image_features(media).collect()}
        assert a == b
        assert all(len(v[2]) == 8 for v in a.values())
        assert all(16 <= v[0] < 80 and 16 <= v[1] < 80 for v in a.values())

    def test_resize_preserves_schema_and_updates_meta(self, media):
        out = resize_image(media, 32, 32)
        assert [(f.name, f.dataType) for f in out.schema.fields] == [
            (f.name, f.dataType) for f in media.schema.fields
        ]
        rows = out.collect()
        for r in rows:
            assert r["n_bytes"] == len(bytes(r["payload"]))
            assert r["sha"] == hashlib.sha256(bytes(r["payload"])).hexdigest()
            assert r["n_bytes"] <= 4096

    def test_audio_features(self, media):
        rows = extract_audio_features(media).collect()
        assert len(rows) == 5
        for r in rows:
            assert 100 <= r["duration_ms"] < 60100
            assert len(r["features"]) == 8

    def test_video_frames(self, media):
        rows = sample_video_frames(media, every_n=1).collect()
        assert {r["media_id"] for r in rows} == {1, 2, 3, 4, 5}
        by_id = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r["frame_no"])
        for fid, nos in by_id.items():
            assert nos == sorted(nos)
            assert len(nos) <= 4

    def test_decode_image_is_a_loud_stub(self):
        from groonga_spark.ops.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8")
