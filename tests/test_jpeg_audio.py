"""Baseline JPEG codec (operators/jpeg.py) and WAV/PCM audio path:
round-trip accuracy bounds, boundary rejections, and the Spark feature
pipelines over both."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.operators.jpeg import decode_jpeg, encode_jpeg
from resolve_overlap_and_gap_spark.operators.multimodal import (
    _decode_wav,
    audio_features,
    encode_wav,
    extract_features,
    synthesize_audio,
    synthesize_media,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse else np.inf


def test_jpeg_constant_image_exact():
    img = np.full((24, 40, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) == 0


def test_jpeg_gradient_high_quality_tight():
    y, x = np.mgrid[0:64, 0:48]
    img = np.stack([(x * 2) % 256, (y * 2) % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_noise_psnr_and_sizes():
    rng = np.random.default_rng(1)
    for shape in ((56, 72, 3), (17, 9, 3), (8, 8, 3), (1, 1, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == img.shape
        assert _psnr(out, img) > 25.0   # noise is JPEG's worst case


def test_jpeg_grayscale_roundtrip():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (33, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, 92))
    assert out.shape == (33, 21, 1)
    assert _psnr(out[:, :, 0], g) > 30.0


def test_jpeg_quality_monotone_size():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_rejects_non_baseline():
    # progressive (SOF2) is SUPPORTED since round 5: a scanless SOF2
    # stream fails for the right reason (no SOS), not as a rejection
    sof2 = (b"\xff\xd8" + struct.pack(">HH", 0xFFC2, 13)
            + struct.pack(">BHHB", 8, 4, 4, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        decode_jpeg(sof2)
    # arithmetic coding (SOF10) stays a parse-level boundary
    sof10 = (b"\xff\xd8" + struct.pack(">HH", 0xFFCA, 13)
             + struct.pack(">BHHB", 8, 4, 4, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof10)
    # restart intervals are SUPPORTED since round 5; a DRI-only stream now
    # fails for the right reason (no SOF/SOS), not as a feature rejection
    dri = (b"\xff\xd8" + struct.pack(">HHH", 0xFFDD, 4, 8))
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        decode_jpeg(dri)
    # sampling factors beyond 2 stay a parse-level boundary
    sof3 = (b"\xff\xd8" + struct.pack(">HH", 0xFFC0, 13)
            + struct.pack(">BHHB", 8, 4, 4, 1) + bytes([1, 0x41, 0]))
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(sof3)
    with pytest.raises(ValueError):
        decode_jpeg(b"nope")


def test_wav_roundtrip_and_rejection():
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32767, (777, 2)).astype(np.int16)
    d, rate = _decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and np.array_equal(d, s)
    # 8-bit WAV rejected at the fmt chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        _decode_wav(buf)


@pytest.mark.spark
def test_jpeg_payloads_through_feature_pipeline(spark):
    """fmt='jpeg' media decodes through mapInPandas; features close to the
    'fake' (lossless) features of the same seeded pixels."""
    def feats(fmt):
        media = synthesize_media(spark, 18, partitions=2, fmt=fmt)
        return {r.media_id: r for r in extract_features(media, grid=4).collect()}

    fj, ff = feats("jpeg"), feats("fake")
    assert set(fj) == set(ff)
    for mid in fj:
        assert (fj[mid].width, fj[mid].height, fj[mid].channels) == \
               (ff[mid].width, ff[mid].height, ff[mid].channels)
        # lossy but close: noise at q85-95 keeps the global mean within ~2
        assert abs(fj[mid].mean_byte - ff[mid].mean_byte) < 2.5


@pytest.mark.spark
def test_audio_features_closed_form(spark):
    out = {r.media_id: r for r in
           audio_features(synthesize_audio(spark, 40, partitions=2)).collect()}
    assert len(out) == 40
    for k, r in out.items():
        amp, half, length = 1000 + k % 2000, 8 + k % 16, 2048 + k % 1024
        assert r.n_samples == length and r.channels == 1 and r.rate == 16000
        assert r.peak == amp and r.rms == float(amp)
        assert r.zero_crossings == (length - 1) // half


def test_avi_mjpeg_container_roundtrip():
    from resolve_overlap_and_gap_spark.operators.multimodal import (
        _avi_frame_chunks,
        encode_avi_mjpeg,
    )
    from resolve_overlap_and_gap_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(5)]
    buf = encode_avi_mjpeg(frames, fps=25)
    chunks, fps = _avi_frame_chunks(buf)
    assert fps == 25 and len(chunks) == 5
    for f, (off, ln) in enumerate(chunks):
        out = decode_jpeg(buf[off:off + ln])
        assert out.shape == (16, 24, 3)
        mse = np.mean((out.astype(float) - frames[f].astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 25.0


def test_avi_rejects_non_mjpeg():
    from resolve_overlap_and_gap_spark.operators.multimodal import (
        _avi_frame_chunks,
    )

    strh = b"vids" + b"H264" + bytes(48)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(strh)) + b"AVI "
           + b"strh" + struct.pack("<I", len(strh)) + strh)
    with pytest.raises(NotImplementedError):
        _avi_frame_chunks(bad)


@pytest.mark.spark
def test_video_frame_sample_seeks_only_sampled_frames(spark):
    """Every-2nd sampling over the real container: frame ids are even,
    counts match ceil(T/2), and constant frames decode to exact means."""
    from resolve_overlap_and_gap_spark.operators.multimodal import (
        synthesize_video,
        video_frame_sample,
    )

    media = synthesize_video(spark, 25, partitions=2)
    rows = video_frame_sample(media, every=2).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(25))
    for k, rs in by_id.items():
        total = 4 + k % 4
        assert sorted(r.frame for r in rs) == list(range(0, total, 2))
        for r in rs:
            assert (r.width, r.height) == (32, 24)
            assert r.mean_byte == float((k * 7 + r.frame * 11) % 256)


def test_audio_fingerprint_polarity_phase_invariant():
    """The energy-delta fingerprint (multimodal.audio_fingerprint bit
    rule) ignores polarity and phase — re-encodings/inversions of one
    recording collide — while a different loudness envelope diverges."""
    import numpy as np

    def fp(x, frame=256, nbits=64):
        x = x.astype(np.int64)
        nf = nbits + 1
        pad = np.zeros(nf * frame, np.int64)
        pad[:min(len(x), nf * frame)] = x[:nf * frame]
        e = (pad * pad).reshape(nf, frame).sum(axis=1)
        return sum(1 << k for k, b in enumerate(e[1:] > e[:-1]) if b)

    i = np.arange(3000, dtype=np.int64)
    amp = 1000 + 500 * ((i // 256) % 3)
    sq = 1 - 2 * ((i // 11) % 2)
    a = (amp * sq).astype(np.int16)
    inverted = (-a).astype(np.int16)
    shifted_phase = (amp * (1 - 2 * (((i + 5) // 11) % 2))).astype(np.int16)
    assert fp(a) == fp(inverted) == fp(shifted_phase)
    other_env = ((1000 + 500 * (((i // 256) + 1) % 3)) * sq).astype(np.int16)
    assert fp(other_env) != fp(a)
