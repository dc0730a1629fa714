"""Progressive JPEG (SOF2, T.81 Annex G): encoder scan script + the
multi-scan successive-approximation decoder.  Pure python/numpy — no
Spark.

The load-bearing property: with every refinement scan present,
progressive transmission is LOSSLESS over the quantized coefficients,
so decode(encode(img, progressive=True)) must be bit-identical to
decode(encode(img)) at the same quality/subsampling — every check here
is exact equality against the baseline codec, which the 420/444
invariant oracles already pin end-to-end.
"""

import numpy as np
import pytest

import resolve_overlap_and_gap_spark.operators.jpeg as J
from resolve_overlap_and_gap_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_batch,
    encode_jpeg,
)


def _noise(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("shape,sub", [
    ((32, 48, 3), "444"),
    ((33, 47, 3), "420"),   # odd dims: MCU padding blocks exist and the
    ((40, 24, 3), "422"),   # non-interleaved AC scans must skip them
    ((31, 31), "444"),      # grayscale single-component script
    ((9, 9, 3), "420"),
])
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_progressive_matches_baseline(shape, sub, quality):
    img = _noise(shape, hash((shape, quality)) % 2**32)
    d0 = decode_jpeg(encode_jpeg(img, quality, subsampling=sub))
    dp = decode_jpeg(encode_jpeg(img, quality, subsampling=sub,
                                 progressive=True))
    assert np.array_equal(d0, dp)


@pytest.mark.parametrize("ri", [1, 3, "row"])
def test_progressive_restart_intervals(ri):
    """Per-scan restart markers: DC scans count MCUs, non-interleaved AC
    scans count that component's blocks; predictors and EOB runs reset
    at every RSTn."""
    img = _noise((33, 47, 3), 5)
    d0 = decode_jpeg(encode_jpeg(img, 85, subsampling="420"))
    dp = decode_jpeg(encode_jpeg(img, 85, subsampling="420",
                                 progressive=True, restart_interval=ri))
    assert np.array_equal(d0, dp)


def test_progressive_eob_runs_and_custom_tables():
    """eob_runs=True codes EOBn run skips (G.1.2.2) with a flat custom
    Huffman table carrying the EOBn symbols the Annex K tables lack —
    the wild-stream decoder paths: EOBn block skipping in first scans,
    buffered correction bits behind an EOB run in refinement scans, and
    non-standard DHT segments."""
    # smooth content maximizes long EOB runs across blocks
    g = (np.arange(64)[:, None] // 16 + np.arange(96)[None, :] // 16)
    img = np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
    for quality in (30, 85):
        d0 = decode_jpeg(encode_jpeg(img, quality, subsampling="420"))
        dp = decode_jpeg(encode_jpeg(img, quality, subsampling="420",
                                     progressive=True, eob_runs=True))
        assert np.array_equal(d0, dp)
    # noise + restarts + EOB runs together
    img = _noise((48, 48, 3), 9)
    d0 = decode_jpeg(encode_jpeg(img, 85))
    dp = decode_jpeg(encode_jpeg(img, 85, progressive=True, eob_runs=True,
                                 restart_interval=2))
    assert np.array_equal(d0, dp)


def test_progressive_stream_is_sof2_multiscan():
    img = _noise((32, 32, 3), 1)
    buf = encode_jpeg(img, 85, progressive=True)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    p = J._parse_jpeg(buf)
    assert p.progressive
    # libjpeg-style color script: 1 DC + 4 AC first + 1 DC refine
    # + 4 AC refine scans
    assert len(p.scans) == 10
    assert p.scans[0]["ss"] == 0 and p.scans[0]["al"] == 1
    assert [len(s["comps"]) for s in p.scans] == [3, 1, 1, 1, 1, 1, 3, 1, 1, 1]
    # final scans land at full precision
    assert {(s["ah"], s["al"]) for s in p.scans[-4:]} == {(1, 0)}


def test_progressive_partial_scans_degrade_gracefully():
    """Truncated-progressive rendering: dropping the refinement scans
    leaves a valid coarse image (coefficients at reduced precision), the
    behavior browsers rely on."""
    img = _noise((32, 32, 3), 3)
    buf = encode_jpeg(img, 85, progressive=True)
    p = J._parse_jpeg(buf)
    full = J._reconstruct(p, J._entropy_progressive(p))
    p.scans = p.scans[:5]        # DC + AC first scans only
    coarse = J._reconstruct(p, J._entropy_progressive(p))
    assert coarse.shape == full.shape
    err = np.abs(coarse.astype(int) - full.astype(int)).mean()
    assert 0 < err < 32          # coarse but recognizably the same image


def test_progressive_in_batch_decode():
    """decode_jpeg_batch blends progressive images with the vectorized
    baseline cursor fleet, index-aligned."""
    imgs = [_noise((24, 24, 3), i) for i in range(6)]
    bufs = [encode_jpeg(im, 85, progressive=(i % 2 == 1),
                        restart_interval=1) for i, im in enumerate(imgs)]
    outs = decode_jpeg_batch(bufs)
    refs = [decode_jpeg(b) for b in bufs]
    assert all(np.array_equal(a, b) for a, b in zip(outs, refs))


def test_progressive_blockgrad_420_bit_exact():
    """The multimodal_invariants_prog premise: block-gradient content is
    DC-only per block, survives 4:2:0 progressive round-trip bit-exactly,
    so the closed-form mean holds."""
    g = (8 * (np.arange(48)[:, None] // 16)
         + 8 * (np.arange(64)[None, :] // 16) + 37).astype(np.uint8)
    px = np.repeat(g[:, :, None], 3, axis=2)
    for q in (85, 90, 95):
        out = decode_jpeg(encode_jpeg(px, q, subsampling="420",
                                      progressive=True, restart_interval=1))
        assert (out == px).all(), f"q={q}"
