"""Multimodal plumbing: schemas, batch shapes, determinism, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docprocai_service_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    byte_stats,
    decode_image_features,
    normalize_media,
    pcm_normalize,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"m{i}", "image/jpeg" if i % 2 == 0 else "video/mp4",
         16 + i, 24 + i, 5000 if i % 2 else None,
         bytes([(i * 7 + j) % 256 for j in range(400)]))
        for i in range(12)
    ]
    # video rows: duration set, image rows: none
    rows = [
        (mid, mime, w, h, (5000 if mime.startswith("video") else None), content)
        for (mid, mime, w, h, _d, content) in rows
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).localCheckpoint()


def test_decode_features_shape_and_determinism(spark, media):
    imgs = media.filter(F.col("mime").startswith("image"))
    a = sorted(map(tuple, decode_image_features(imgs).collect()))
    b = sorted(map(tuple, decode_image_features(imgs.repartition(5)).collect()))
    assert a == b  # partitioning-invariant
    assert len(a) == imgs.count()
    for _, mean_luma, std_luma, ph in a:
        assert 0 <= mean_luma <= 255 and std_luma >= 0 and isinstance(ph, int)


def test_decode_features_tiny_images(spark, media):
    """ADVICE: declared dims < 8 must not crash the block reshape."""
    tiny = spark.createDataFrame(
        [("t1", "image/jpeg", 4, 3, None, b"\x01\x02\x03"),
         ("t2", "image/jpeg", 1, 1, None, b"\xff"),
         ("t3", "image/jpeg", 7, 20, None, bytes(range(64)))],
        MEDIA_SCHEMA,
    )
    out = decode_image_features(tiny).collect()
    assert len(out) == 3
    assert all(0 <= r["mean_luma"] <= 255 for r in out)


def test_resize_output_dims(spark, media):
    out = resize_images(media.limit(3), out_h=4, out_w=6).collect()
    assert all(len(r["pixels"]) == 24 for r in out)


def test_frame_sampling_fanout(spark, media):
    vids = media.filter(F.col("mime").startswith("video"))
    frames = sample_frames(vids, every_ms=1000)
    per = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert all(n == 5 for n in per.values())  # 5000ms / 1000ms
    # frame timestamps aligned and crc real
    one = frames.filter(F.col("frame_no") == 2).first()
    assert one["ts_ms"] == 2000 and one["frame_crc"] >= 0


def test_byte_stats_real_values(spark, media):
    st = byte_stats(media).collect()
    assert all(r["n_bytes"] == 400 for r in st)
    assert all(0.0 <= r["byte_entropy"] <= 8.0 for r in st)


def test_pcm_normalize_real_math(spark):
    """pcm_normalize is REAL: int16 samples scale so peak hits 0.95 FS."""
    import numpy as np

    quiet = (np.array([100, -200, 50], dtype="<i2")).tobytes()
    loud = (np.array([32000, -16000], dtype="<i2")).tobytes()
    empty = b""
    rows = [("q", "audio/pcm", None, None, None, quiet),
            ("l", "audio/pcm", None, None, None, loud),
            ("e", "audio/pcm", None, None, None, empty)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in pcm_normalize(media, peak=0.95).collect()}
    q = np.frombuffer(out["q"]["content"], dtype="<i2")
    assert abs(int(np.abs(q).max()) - round(0.95 * 32767)) <= 1
    # relative sample ratios preserved (linear gain)
    assert abs(q[0] / q[1] + 0.5) < 0.02
    l = np.frombuffer(out["l"]["content"], dtype="<i2")
    assert abs(int(np.abs(l).max()) - round(0.95 * 32767)) <= 1
    assert out["e"]["content"] == b"" and out["e"]["scale"] == 1.0


def test_normalize_media_dispatch(spark):
    rows = [("a", "application/pdf", None, None, None, b"%PDF-1.7 payload"),
            ("b", "application/vnd.pptx", None, None, None, b"PKpptxbytes")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in normalize_media(media).collect()}
    assert out["a"]["converted"] is False and bytes(out["a"]["content"]) == b"%PDF-1.7 payload"
    assert out["b"]["converted"] is True and out["b"]["mime"] == "application/pdf"
    assert bytes(out["b"]["content"]).endswith(b"PKpptxbytes")  # payload intact
    with pytest.raises(NotImplementedError):
        normalize_media(media, codec="real")


def test_real_codec_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_image_features(media, codec="real")
    with pytest.raises(NotImplementedError):
        sample_frames(media, codec="real")
    with pytest.raises(NotImplementedError):
        resize_images(media, 4, 4, codec="real")


def test_wav_extract_real_riff_parse_and_resample(spark):
    """wav_extract_audio is REAL for PCM WAV: stdlib-`wave`-written stereo
    44.1kHz audio parses, mono-mixes, and resamples to 16kHz with output
    matching an independent np.interp reference; non-PCM and junk rows
    surface typed errors instead of bytes."""
    import io
    import struct
    import wave

    import numpy as np

    from docprocai_service_spark.operators.multimodal import wav_extract_audio

    rate, dur_s = 44100, 0.25
    t = np.arange(int(rate * dur_s))
    left = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    right = (8000 * np.sin(2 * np.pi * 220 * t / rate)).astype("<i2")
    stereo = np.column_stack([left, right]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(stereo.tobytes())
    wav_bytes = buf.getvalue()

    # a RIFF container claiming a compressed codec (fmt tag 85 = mp3)
    bad_fmt = struct.pack("<HHIIHH", 85, 2, rate, rate * 4, 4, 16)
    mp3ish = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
              + b"fmt " + struct.pack("<I", 16) + bad_fmt
              + b"data" + struct.pack("<I", 0))

    media = spark.createDataFrame(
        [("wav1", wav_bytes), ("mp3ish", mp3ish), ("junk", b"not audio at all")],
        "media_id string, content binary",
    )
    rows = {r["media_id"]: r for r in wav_extract_audio(media).collect()}

    ok = rows["wav1"]
    assert ok["error"] is None
    assert ok["n_channels"] == 2 and ok["n_samples"] == len(t)
    assert ok["duration_ms"] == int(dur_s * 1000)
    got = np.frombuffer(bytes(ok["pcm16"]), dtype="<i2")
    # independent reference: mono mean then linear resample to 16k
    mono = np.column_stack([left, right]).astype(np.float64).mean(axis=1)
    n_out = int(round(len(mono) * 16000 / rate))
    want = np.clip(np.rint(np.interp(np.arange(n_out) * (rate / 16000),
                                     np.arange(len(mono)), mono)), -32768, 32767).astype("<i2")
    assert len(got) == n_out and np.array_equal(got, want)

    assert rows["mp3ish"]["error"] == "unsupported-codec:85"
    assert rows["mp3ish"]["pcm16"] is None
    assert rows["junk"]["error"] == "not-riff-wave"
