"""ISO BMFF (MP4) demux/mux tests: box round-trip, sample tables,
MJPEG frame decode, and the compressed-codec refusal contract."""

import struct

import numpy as np
import pytest

from hogzilla_spark.operators import mp4 as M
from hogzilla_spark.operators.jpeg import encode_jpeg


def _frames(n, w=24, h=16):
    out = []
    for f in range(n):
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        img = np.stack(
            [((xs + f * 5) % 8) * 32, (ys % 8) * 32, np.full_like(xs, f * 60 % 256)],
            axis=2,
        ).astype(np.uint8)
        out.append(img)
    return out


def test_mux_parse_roundtrip_metadata():
    imgs = _frames(4)
    payload = M.encode_mp4_mjpeg([encode_jpeg(i, quality=95) for i in imgs], fps=2)
    tracks = M.parse_mp4(payload)
    assert len(tracks) == 1
    t = tracks[0]
    assert t.handler == "vide"
    assert t.codec == "jpeg"
    assert (t.width, t.height) == (24, 16)
    assert t.n_samples == 4
    assert t.timescale == 1000
    assert t.duration_ms == 2000  # 4 frames @ 2 fps
    # sample table: contiguous offsets, correct sizes
    assert t.sample_offsets[0] > 0
    for i in range(1, 4):
        assert t.sample_offsets[i] == t.sample_offsets[i - 1] + t.sample_sizes[i - 1]
    assert t.sample_times == [0, 500, 1000, 1500]


def test_demux_returns_original_jpeg_bytes():
    jpegs = [encode_jpeg(i, quality=90) for i in _frames(3)]
    payload = M.encode_mp4_mjpeg(jpegs, fps=1)
    samples = M.demux_mp4(payload)
    assert [s for _, s in samples] == jpegs
    assert [ts for ts, _ in samples] == [0, 1000, 2000]


def test_decode_mp4_frames_real_pixels():
    imgs = _frames(2)
    payload = M.encode_mp4_mjpeg([encode_jpeg(i, quality=95) for i in imgs], fps=1)
    decoded = M.decode_mp4_frames(payload)
    assert len(decoded) == 2
    for (ts, out), src in zip(decoded, imgs):
        assert out.shape == src.shape
        assert np.abs(out.astype(int) - src.astype(int)).max() <= 12  # lossy


def test_compressed_codec_demuxes_but_refuses_decode():
    payload = M.encode_mp4_mjpeg([encode_jpeg(_frames(1)[0])], fps=1)
    patched = payload.replace(
        struct.pack(">I", 86) + b"jpeg", struct.pack(">I", 86) + b"avc1", 1
    )
    t = M.parse_mp4(patched)[0]
    assert t.codec == "avc1"
    assert M.demux_mp4(patched)  # container still demuxes
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        M.decode_mp4_frames(patched)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        M.parse_mp4(b"\x00" * 64)
    with pytest.raises(ValueError):
        M.parse_mp4(struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4)  # no moov


def test_co64_and_multi_stsc_runs():
    """Hand-build a two-chunk layout (stsc with two runs, co64 offsets)
    to exercise the chunk-walk beyond the single-chunk writer."""
    jpegs = [encode_jpeg(i, quality=90) for i in _frames(3, w=8, h=8)]
    # chunk 1: samples 1-2; chunk 2: sample 3
    ftyp = M._box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_body = b"".join(jpegs)
    c1 = len(ftyp) + 8
    c2 = c1 + len(jpegs[0]) + len(jpegs[1])
    mdat = M._box(b"mdat", mdat_body)
    stsd = M._full_box(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 8, 8)
        + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">I", 0)
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1),
    )
    stts = M._full_box(b"stts", 0, 0, struct.pack(">III", 1, 3, 100))
    stsc = M._full_box(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)  # chunk 1 holds 2 samples
        + struct.pack(">III", 2, 1, 1),  # chunk 2 holds 1
    )
    stsz = M._full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 3) + struct.pack(">3I", *[len(j) for j in jpegs]),
    )
    co64 = M._full_box(b"co64", 0, 0, struct.pack(">I", 2) + struct.pack(">QQ", c1, c2))
    stbl = M._box(b"stbl", stsd + stts + stsc + stsz + co64)
    mdhd = M._full_box(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 300, 0x55C4, 0)
    )
    hdlr = M._full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    minf = M._box(b"minf", M._box(b"stbl", b"") * 0 + stbl)
    mdia = M._box(b"mdia", mdhd + hdlr + minf)
    tkhd = M._full_box(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 300) + struct.pack(">8x4H", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 8 << 16, 8 << 16),
    )
    trak = M._box(b"trak", tkhd + mdia)
    mvhd = M._full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, 300) + struct.pack(">iH2x8x", 0x10000, 0x100)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2),
    )
    payload = ftyp + mdat + M._box(b"moov", mvhd + trak)
    samples = M.demux_mp4(payload)
    assert [s for _, s in samples] == jpegs
    assert [ts for ts, _ in samples] == [0, 100, 200]
