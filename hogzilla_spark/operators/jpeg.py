"""Baseline JFIF (JPEG) codec in pure numpy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT (SOF0), 8-bit, generic per-component
sampling factors (4:4:4, 4:2:0, 4:2:2, grayscale), multiple DQT/DHT
segments, restart intervals (DRI/RSTn), byte-stuffed entropy stream.
Progressive (SOF2) / arithmetic / 12-bit raise NotImplementedError.

Encoder: quality-scaled Annex-K-style quantization, 4:4:4 (no chroma
subsampling), standard-shape Huffman tables written into DHT segments.
The stream is fully self-describing (tables travel in the file), so the
decoder never assumes the encoder's constants — round-trip tests prove
both directions against each other, and libjpeg-produced baseline files
decode with the same code path.

The 2-D DCT runs as two 8×8 orthonormal matrix products
(``D @ B @ D.T``), which equals the JPEG FDCT definition exactly;
Huffman entropy coding is bit-serial Python — fine for test-sized
images, and the honest swap point for a real deployment is libjpeg via
PIL, not a faster Python loop.

Reference for scope: this replaces the `_fake_embedding` fallback for
``codec == "jpeg"`` in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants -------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """8×8 zigzag scan order, generated (not transcribed) to avoid
    typo-class bugs: walk anti-diagonals, alternating direction."""
    order = []
    for d in range(15):
        idxs = [(d - j, j) for j in range(d + 1) if 0 <= d - j < 8 and 0 <= j < 8]
        if d % 2 == 0:
            idxs = idxs[::-1]
        order.extend(r * 8 + c for r, c in idxs)
    return np.array(order, dtype=np.int32)

ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )

# Annex-K base quantization tables (luma, chroma)
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# Standard-shape Huffman specs (BITS counts + values).  Only the
# ENCODER uses these; the decoder always reads tables from DHT.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

# Encoder AC tables: canonical Annex-K ordering matters only for coding
# efficiency, not correctness, so build a VALID table with the standard
# code-length histogram shape replaced by a flat assignment: every
# (run,size) symbol plus ZRL and EOB gets a fixed-length code.  Validity
# (prefix-free, fits 16 bits) is guaranteed by construction.
AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

def _flat_huff_spec(symbols: list[int]) -> tuple[list[int], list[int]]:
    """BITS/VALS for a flat code: all symbols at ceil(log2(n))+? length.
    A canonical Huffman table with every code the same length L needs
    len(symbols) <= 2^L - 1 (all-ones code of length L must stay free
    only at L=16; for L<16 full use is fine per the JPEG spec, but stay
    conservative and keep one spare)."""
    L = 1
    while (1 << L) - 1 < len(symbols):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)

AC_BITS, AC_VALS = _flat_huff_spec(AC_SYMBOLS)
DC_FLAT_BITS, DC_FLAT_VALS = _flat_huff_spec(list(range(12)))

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman: symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out

def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out

def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)

# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, extra bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1

def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    dc_pred: int,
) -> int:
    coef = _D @ (block - 128.0) @ _D.T
    q = np.round(coef / qt).astype(np.int32).ravel()[ZIGZAG]
    dc = int(q[0])
    s, extra = _magnitude(dc - dc_pred)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(extra, s)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q) else 0
    for i in range(1, 64):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s, extra = _magnitude(v)
        c, l = ac_codes[(run << 4) | s]
        bw.write(c, l)
        bw.write(extra, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return dc

def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

def _dqt_segment(tid: int, qt: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(qt.astype(np.uint8).ravel()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body

def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """RGB HxWx3 (or grayscale HxW) uint8 → baseline JFIF, 4:4:4."""
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w = img.shape[:2]
    ncomp = 1 if gray else 3
    qts = [_quality_scale(QT_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(QT_CHROMA, quality))
    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
        planes = [y, cb, cr]
    bh, bw_ = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, bh - h), (0, bw_ - w)), mode="edge") for p in planes
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _dqt_segment(0, qts[0])
    if not gray:
        out += _dqt_segment(1, qts[1])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_FLAT_BITS, DC_FLAT_VALS)
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_FLAT_BITS, DC_FLAT_VALS)
        out += _dht_segment(1, 1, AC_BITS, AC_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = _build_codes(DC_FLAT_BITS, DC_FLAT_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bwr = _BitWriter()
    preds = [0] * ncomp
    for by in range(0, bh, 8):
        for bx in range(0, bw_, 8):
            for ci in range(ncomp):
                qt = qts[0 if ci == 0 else 1]
                preds[ci] = _encode_block(
                    bwr,
                    planes[ci][by : by + 8, bx : bx + 8],
                    qt,
                    dc_codes,
                    ac_codes,
                    preds[ci],
                )
    bwr.flush()
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

# --- decoder ----------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("hit marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_past_restart(self) -> None:
        """Consume the RSTn marker at the current byte position."""
        self.acc = 0
        self.n = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2

class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker

def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")

def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF → HxWx3 uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if prec == 0:
                    raw = np.frombuffer(seg, np.uint8, 64, sp).astype(np.float64)
                    sp += 64
                else:
                    raw = np.frombuffer(seg, ">u2", 64, sp).astype(np.float64)
                    sp += 128
                qts[tid] = raw[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tclass, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = _build_decode_table(
                    bits, vals
                )
                sp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            for ci in range(nc):
                cid, hv, qid = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "q": qid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}); "
                "progressive/arithmetic need libjpeg"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tabs = seg[1 + si * 2], seg[2 + si * 2]
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = dc_tabs[tabs >> 4]
                comp["ac"] = ac_tabs[tabs & 0x0F]
                scan.append(comp)
            break
        # else: APPn/COM — skip

    if len(scan) == 1:
        # Non-interleaved single-component scan: one 8×8 block per MCU
        # regardless of the component's declared sampling factors
        # (ITU-T T.81 §A.2.2) — a libjpeg grayscale file may declare
        # 2x2 factors but its scan data is still one block per MCU.
        scan[0]["h"] = scan[0]["v"] = 1
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in scan:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        c["pred"] = 0

    br = _BitReader(payload, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker
                while True:
                    if (
                        payload[br.pos] == 0xFF
                        and 0xD0 <= payload[br.pos + 1] <= 0xD7
                    ):
                        break
                    br.pos += 1
                br.align_past_restart()
                for c in scan:
                    c["pred"] = 0
            for c in scan:
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        q = np.zeros(64, dtype=np.float64)
                        s = _decode_huff(br, c["dc"])
                        diff = _extend(br.bits(s), s) if s else 0
                        c["pred"] += diff
                        q[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, c["ac"])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            sz = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow")
                            q[k] = _extend(br.bits(sz), sz)
                            k += 1
                        coef = (q[UNZIGZAG].reshape(8, 8)) * qts[c["q"]]
                        block = _D.T @ coef @ _D + 128.0
                        y0 = (my * c["v"] + byi) * 8
                        x0 = (mx * c["h"] + bxi) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample each component to full resolution (nearest neighbor)
    full = []
    for c in scan:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g] * 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
