import pytest

from hybridbackend_spark.operators.multimodal import (
    decode_image_features,
    resize_images,
    sample_video_frames,
    with_media_meta,
)


@pytest.fixture()
def media(spark):
    rows = [(i, bytes([i]) * 100) for i in range(10)]
    return spark.createDataFrame(rows, "media_id: long, payload: binary")


def test_with_media_meta(media):
    out = with_media_meta(media, "payload", "image/png", width=64, height=48)
    row = out.first()
    assert row["meta"]["mime"] == "image/png"
    assert row["meta"]["width"] == 64


def test_decode_image_features_deterministic(media):
    a = decode_image_features(media, dim=16).collect()
    b = decode_image_features(media, dim=16).collect()
    got_a = {r["media_id"]: r["features"] for r in a}
    got_b = {r["media_id"]: r["features"] for r in b}
    assert got_a == got_b
    assert all(len(v) == 16 for v in got_a.values())
    assert got_a[0] != got_a[1]  # payload-dependent


def test_decode_strict_raises(media):
    import py4j

    with pytest.raises(Exception) as ei:
        decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_resize_images(media):
    out = resize_images(media, width=32, height=32).collect()
    assert len(out) == 10
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
    assert all(r["payload"] is not None for r in out)


def test_sample_video_frames_explodes(media):
    out = sample_video_frames(media, n_frames=3).collect()
    assert len(out) == 30
    frames0 = [r for r in out if r["media_id"] == 0]
    assert sorted(r["frame_idx"] for r in frames0) == [0, 1, 2]
    # distinct frames per index
    assert len({bytes(r["frame"]) for r in frames0}) == 3


def test_extract_audio_features(spark):
    from hybridbackend_spark.operators.multimodal import extract_audio_features

    rows = [(i, bytes([i % 251]) * (1500 + 700 * i)) for i in range(4)]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {r["media_id"]: r for r in extract_audio_features(media, dim=8).collect()}
    # frame count follows payload length, not a constant
    assert out[0]["n_frames"] == 2 and out[3]["n_frames"] == 4
    assert all(len(r["features"]) == 8 for r in out.values())
    # deterministic and payload-dependent
    again = {r["media_id"]: r for r in extract_audio_features(media, dim=8).collect()}
    assert out[1]["features"] == again[1]["features"]
    assert out[1]["features"] != out[2]["features"]
