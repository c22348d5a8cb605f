"""Baseline JPEG codec tests (pure numpy + stdlib, no PIL).

Round-trip bounds are LOSSY bounds: quality 100 keeps quantization
steps at 1 so errors stay within DCT rounding; lower qualities get
looser tolerances.  The 4:2:0 test hand-builds an interleaved-MCU
stream with the module's own bit writer to exercise the decoder's
generic sampling-factor path, which the 4:4:4 encoder never emits.
"""

import struct

import numpy as np
import pytest

from hogzilla_spark.operators import jpeg as J

def _gradient(h, w, seed=0):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xs * 255 // max(1, w - 1)), (ys * 255 // max(1, h - 1)), ((xs + ys) % 256)],
        axis=2,
    ).astype(np.uint8)

@pytest.mark.parametrize("quality,tol", [(100, 4), (95, 10), (75, 26)])
def test_jpeg_roundtrip_quality(quality, tol):
    img = _gradient(40, 56)
    back = J.decode_jpeg(J.encode_jpeg(img, quality=quality))
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).max() <= tol

def test_jpeg_odd_dimensions_and_grayscale():
    img = _gradient(13, 21)  # forces edge padding, partial blocks
    back = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert back.shape == (13, 21, 3)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 3.0
    g = _gradient(16, 16)[:, :, 0]
    backg = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert backg.shape == (16, 16, 3)
    assert np.abs(backg[:, :, 0].astype(int) - g.astype(int)).max() <= 6

def test_jpeg_grayscale_ignores_sampling_factors():
    """A single-component (non-interleaved) scan is one block per MCU
    regardless of declared sampling factors (T.81 §A.2.2): patching the
    SOF HV byte from 1x1 to 2x2 must not change the decode."""
    g = _gradient(24, 24)[:, :, 0]
    payload = bytearray(J.encode_jpeg(g, quality=95))
    sof = payload.index(b"\xff\xc0")
    # FFC0 len(2) prec(1) h(2) w(2) ncomp(1) compid(1) -> HV byte
    hv = sof + 11
    assert payload[hv] == 0x11
    payload[hv] = 0x22
    assert np.array_equal(
        J.decode_jpeg(bytes(payload)), J.decode_jpeg(J.encode_jpeg(g, quality=95))
    )

def test_jpeg_flat_color_exact():
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert np.abs(back.astype(int) - 128).max() <= 1

def test_jpeg_rejects_progressive_and_garbage():
    img = _gradient(8, 8)
    good = bytearray(J.encode_jpeg(img))
    # rewrite the SOF0 marker (FF C0) to SOF2 (progressive)
    sof = bytes(good).find(b"\xff\xc0")
    good[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        J.decode_jpeg(bytes(good))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01\x02")

def test_jpeg_420_subsampled_decode():
    """Hand-assemble a 16x16 4:2:0 stream (one MCU: 4 Y + 1 Cb + 1 Cr)
    and check the decoder reconstructs the luma structure and the
    chroma upsampling."""
    h = w = 16
    # luma: left half dark, right half bright; chroma: constant red tint
    y_plane = np.zeros((16, 16), dtype=np.float64)
    y_plane[:, 8:] = 200.0
    y_plane[:, :8] = 50.0
    cb_plane = np.full((8, 8), 110.0)
    cr_plane = np.full((8, 8), 160.0)

    qt = np.ones((8, 8))  # lossless-ish quantization
    dc_codes = J._build_codes(J.DC_FLAT_BITS, J.DC_FLAT_VALS)
    ac_codes = J._build_codes(J.AC_BITS, J.AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += J._dqt_segment(0, qt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0])
    sof += bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J.DC_FLAT_BITS, J.DC_FLAT_VALS)
    out += J._dht_segment(1, 0, J.AC_BITS, J.AC_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = J._BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    for byi in range(2):  # interleave: 4 Y blocks then Cb, Cr
        for bxi in range(2):
            preds["y"] = J._encode_block(
                bw, y_plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8],
                qt, dc_codes, ac_codes, preds["y"],
            )
    preds["cb"] = J._encode_block(bw, cb_plane, qt, dc_codes, ac_codes, preds["cb"])
    preds["cr"] = J._encode_block(bw, cr_plane, qt, dc_codes, ac_codes, preds["cr"])
    bw.flush()
    out += bw.out + b"\xff\xd9"

    img = J.decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    # luma step survives: right side much brighter
    assert img[:, 12:, :].mean() - img[:, :4, :].mean() > 100
    # constant positive Cr → red channel above green everywhere
    assert (img[:, :, 0].astype(int) - img[:, :, 1].astype(int)).min() > 0

def test_jpeg_in_media_pipeline(spark):
    """synthetic_media's JPEG rows decode through the Spark featurize
    path, and a JPEG of a flat image featurizes ≈ its PPM twin."""
    from hogzilla_spark.operators import multimodal as MM

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    rows = [
        (0, "image", "ppm", 8, 8, 0, MM.encode_ppm(img)),
        (1, "image", "jpeg", 8, 8, 0, J.encode_jpeg(img, quality=95)),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = {
        r.media_id: r.feature
        for r in MM.decode_and_featurize(media, strict=True).collect()
    }
    assert feats[0][0] == pytest.approx(feats[1][0], abs=0.01)  # gray mean
