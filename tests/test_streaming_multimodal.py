"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import Catalog, load  # noqa: E402
from crmint_spark.operators import multimodal  # noqa: E402
from crmint_spark.streaming import events as streaming_events  # noqa: E402


@pytest.fixture()
def events_json_dir(spark, tmp_path):
    """Dump sf0.001 events as NDJSON to act as a streaming source dir."""
    out = str(tmp_path / "stream_in")
    df = load(spark, "/root/testdata/sf0.001", "events")
    # single file -> single micro-batch: watermark drops nothing, so the
    # streaming totals are comparable to the batch plan. (Multi-file
    # unordered replay WOULD drop late rows — that's watermark semantics,
    # exercised implicitly by the session test's wide watermark.)
    df.coalesce(1).write.json(out)
    return out


def test_streaming_windowed_counts_matches_batch(spark, tmp_path, events_json_dir):
    from pyspark.sql import functions as F

    stream = streaming_events.stream_events_from_dir(spark, events_json_dir)
    assert stream.isStreaming
    windowed = streaming_events.windowed_event_counts(stream, "1 hour", "2 hours")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    streaming_events.run_to_table(
        windowed, catalog, "p.d.win", str(tmp_path / "ckpt")
    )
    got = catalog.read("p.d.win")
    batch = (
        load(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # streaming (availableNow, watermark drops nothing on ordered replay
    # of a finite dir) must agree with the batch plan on totals
    assert got.agg(F.sum("n_events")).first()[0] == batch.agg(
        F.sum("n_events")
    ).first()[0]
    assert got.count() == batch.count()


def test_streaming_session_windows(spark, tmp_path, events_json_dir):
    from pyspark.sql import functions as F

    stream = streaming_events.stream_events_from_dir(spark, events_json_dir)
    sessions = streaming_events.sessionized_stream(stream, "30 minutes", "4 hours")
    catalog = Catalog(spark, str(tmp_path / "wh2"))
    streaming_events.run_to_table(
        sessions, catalog, "p.d.sess", str(tmp_path / "ckpt2")
    )
    got = catalog.read("p.d.sess")
    assert got.count() > 0
    # every session spans >= 1 event and has start <= end
    bad = got.filter(
        (F.col("n_events") < 1) | (F.col("session_start") > F.col("session_end"))
    ).count()
    assert bad == 0


def test_streaming_restart_is_exactly_once(spark, tmp_path, events_json_dir):
    """Re-running the drain with the same checkpoint must be a no-op:
    the checkpoint records consumed files, so restarts neither reprocess
    nor duplicate (exactly-once table state)."""
    stream = streaming_events.stream_events_from_dir(spark, events_json_dir)
    windowed = streaming_events.windowed_event_counts(stream, "1 hour", "2 hours")
    catalog = Catalog(spark, str(tmp_path / "wh3"))
    ckpt = str(tmp_path / "ckpt3")
    streaming_events.run_to_table(windowed, catalog, "p.d.win2", ckpt)
    first = catalog.read("p.d.win2").collect()
    # restart with the same checkpoint: no new input -> state unchanged
    stream2 = streaming_events.stream_events_from_dir(spark, events_json_dir)
    windowed2 = streaming_events.windowed_event_counts(stream2, "1 hour", "2 hours")
    streaming_events.run_to_table(windowed2, catalog, "p.d.win2", ckpt)
    second = catalog.read("p.d.win2").collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes1", "image/png", 640, 480, None),
        (2, "image", b"\x89PNGfakebytes2", "image/png", 800, 600, None),
        (3, "audio", b"RIFFfakewav", "audio/wav", None, None, 4500),
        (4, "video", b"\x00\x00ftypfakemp4", "video/mp4", 1920, 1080, 3200),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_multimodal_feature_extraction_stub(media_df):
    feats = multimodal.extract_features(media_df).collect()
    assert len(feats) == 4
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == len(b"\x89PNGfakebytes1")
    assert len(by_id[1].feature) == multimodal.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in by_id[1].feature)
    # deterministic: same bytes -> same feature
    feats2 = multimodal.extract_features(media_df).collect()
    assert {r.media_id: r.feature for r in feats2} == {
        r.media_id: r.feature for r in feats
    }


def test_multimodal_real_decode_raises(media_df):
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media_df, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_multimodal_resize_and_frames(media_df):
    resized = multimodal.resize_images(media_df, 224, 224).collect()
    assert len(resized) == 2
    assert all(r.width == 224 and r.height == 224 for r in resized)
    frames = multimodal.sample_frames(media_df, every_ms=1000).collect()
    # 3200ms video sampled at 1000ms -> frames at 0,1000,2000,3000
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]


def _make_ppm(w, h):
    import numpy as np

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return arr, multimodal.encode_ppm(arr)


def _make_wav(n=8000, rate=8000):
    import io
    import wave

    import numpy as np

    t = np.arange(n) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.tobytes())
    return x, buf.getvalue()


def test_multimodal_real_ppm_and_wav_decode(spark):
    """PPM and PCM-WAV payloads are REALLY decoded (stdlib + numpy):
    features match ground truth computed directly on the arrays, even
    with decode_stub=False (no NotImplementedError for these formats)."""
    import numpy as np

    arr, ppm = _make_ppm(16, 12)
    x, wav = _make_wav()
    df = spark.createDataFrame(
        [
            (1, "image", ppm, "image/x-portable-pixmap", 16, 12, None),
            (2, "audio", wav, "audio/wav", None, None, 1000),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r.media_id: r.feature
        for r in multimodal.extract_features(df, decode_stub=False).collect()
    }
    # image: [w, h, mean_r, mean_g, mean_b, lum_mean, lum_std, aspect]
    img = feats[1]
    assert img[0] == 16.0 and img[1] == 12.0
    f = arr.reshape(-1, 3).astype(float)
    assert img[2] == round(float(f[:, 0].mean()), 6)
    assert img[7] == round(16 / 12, 6)
    # audio: [n, rate, dur, rms, zcr, peak, mean_abs, 1.0]
    aud = feats[2]
    assert aud[0] == 8000.0 and aud[1] == 8000.0 and aud[2] == 1.0
    xs = x.astype(float) / 32768.0
    assert aud[3] == round(float(np.sqrt((xs**2).mean())), 6)


def test_multimodal_real_ppm_resize(spark):
    """PPM resize really resamples: the output payload decodes to the
    target dims and equals numpy nearest-neighbor ground truth."""
    import numpy as np

    arr, ppm = _make_ppm(20, 10)
    df = spark.createDataFrame(
        [(1, "image", ppm, "image/x-portable-pixmap", 20, 10, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_images(df, 8, 6).collect()[0]
    dec = multimodal.decode_ppm(bytes(out.content))
    assert dec.shape == (6, 8, 3)
    assert np.array_equal(dec, multimodal.resize_nearest(arr, 8, 6))
    # comment headers survive the parser
    commented = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert multimodal.decode_ppm(commented).shape == (1, 2, 3)


def test_png_codec_roundtrip_and_filters():
    """Pure stdlib-zlib PNG codec: encode->decode is identity, and the
    decoder inverts every scanline filter type (hand-filtered fixtures
    with known pixels, no external PNG library involved)."""
    import struct
    import zlib

    import numpy as np

    from crmint_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def build_png(pixels, filters):
        """Apply the given per-row filter types to known pixels and
        assemble a PNG; decoding must return the original pixels."""
        h, w, ch = pixels.shape
        stride = w * ch
        flat = pixels.reshape(h, stride).astype(np.int32)
        lines = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for r in range(h):
            cur = flat[r]
            f = filters[r % len(filters)]
            enc = np.empty(stride, dtype=np.int32)
            for j in range(stride):
                a = cur[j - ch] if j >= ch else 0
                b_ = prev[j]
                c_ = prev[j - ch] if j >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b_
                elif f == 3:
                    pred = (a + b_) >> 1
                else:
                    p = a + b_ - c_
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c_)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b_ if pb <= pc else c_
                    )
                enc[j] = (cur[j] - pred) % 256
            lines.append(f)
            lines += enc.astype(np.uint8).tobytes()
            prev = cur
        ihdr = struct.pack(
            ">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0
        )
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b"")
        )

    rgb = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(build_png(rgb, filters))
        assert np.array_equal(got, rgb), filters
    # grayscale broadcasts to RGB; RGBA drops alpha
    gray = rng.integers(0, 256, size=(6, 4, 1), dtype=np.uint8)
    got = decode_png(build_png(gray, [1, 4]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    got = decode_png(build_png(rgba, [2, 3]))
    assert np.array_equal(got, rgba[:, :, :3])
    # non-PNG and truncated payloads return None, never raise
    assert decode_png(b"JFIF...") is None
    assert decode_png(_PNG_SIG + b"\x00\x00") is None
