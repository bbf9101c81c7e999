"""Baseline JPEG codec — pure numpy + stdlib, no libjpeg/Pillow.

Implements the SEQUENTIAL BASELINE subset of ITU-T T.81 (the public JPEG
spec): 8-bit samples, Huffman entropy coding, JFIF YCbCr color, any
component sampling factors on decode (4:4:4 / 4:2:0 / 4:2:2 walk the
generic MCU grid of Annex A.2), restart markers, byte stuffing. The
encoder emits 4:4:4 with the spec's Annex K example quantization +
Huffman tables (quality-scaled per the well-known IJG formula) — it
exists so the decoder has deterministic fixtures and so
``resize_images`` can re-encode in-format; compression ratio is not the
point. Progressive, arithmetic coding, 12-bit, and hierarchical modes
are out of scope and raise ``ValueError``.

Reference analogue: ``/root/reference/DataStructure/Library.fs:70-126``
(mail-image ``Resize`` via System.Drawing, which decodes JPEG).

Determinism: both directions are fixed-arithmetic numpy float64 + exact
integer Huffman streams — same input bytes, same output array, any
platform. The decode loop is Python-per-MCU (entropy decoding is
inherently bit-serial); at crawl scale decode runs INSIDE mapInPandas
tasks, so throughput scales with partitions, and typical crawl
thumbnails are tiny.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K)

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 example quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: block_dct = A @ b @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _huff_codes(bits, vals):
    """symbol → (code, length) from the (BITS, HUFFVAL) spec lists
    (T.81 Annex C code-generation procedure)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits, vals):
    """(code, length) → symbol decode dict."""
    return {v: k for k, v in _huff_codes(bits, vals).items()}


def _scale_qt(qt, quality: int):
    """IJG quality scaling of a base table (public libjpeg formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(img):
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        # Truncate to the live bits: without this the Python bigint keeps
        # every emitted byte and each shift copies the whole scan — codec
        # cost goes quadratic in scan length.
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int):
    """(size, bit-pattern) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    pattern = v if v > 0 else v + (1 << size) - 1
    return size, pattern


def _encode_block(bw, block, qt, dc_tab, ac_tab, pred: int) -> int:
    """Huffman-encode one 8×8 sample block; returns the new DC pred."""
    coef = _A @ (block - 128.0) @ _A.T
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    zz = q.ravel()[ZIGZAG]
    diff = int(zz[0]) - pred
    size, pattern = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(pattern, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, pattern = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(pattern, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB (H, W, 3) or grayscale (H, W)/(H, W, 1) uint8 → baseline JFIF
    bytes. ``subsampling``: "444" (one block per component per MCU) or
    "420" (2×2 luma blocks + box-filtered chroma — the common camera
    layout; exists chiefly so the decoder's generic MCU walk has a
    same-codebase fixture). ``restart_interval`` > 0 emits DRI + RSTn
    every N MCUs with DC-prediction resets."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "420" and not gray

    qt_l = _scale_qt(QT_LUMA, quality)
    qt_c = _scale_qt(QT_CHROMA, quality)
    if gray:
        comps = [{"plane": img[:, :, 0].astype(np.float64),
                  "h": 1, "v": 1, "qt": qt_l, "tab": 0}]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if sub420:
            # box-filter chroma 2×2 (pad odd dims by edge replication)
            def down2(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            comps = [
                {"plane": y, "h": 2, "v": 2, "qt": qt_l, "tab": 0},
                {"plane": down2(cb), "h": 1, "v": 1, "qt": qt_c, "tab": 1},
                {"plane": down2(cr), "h": 1, "v": 1, "qt": qt_c, "tab": 1},
            ]
        else:
            comps = [
                {"plane": y, "h": 1, "v": 1, "qt": qt_l, "tab": 0},
                {"plane": cb, "h": 1, "v": 1, "qt": qt_c, "tab": 1},
                {"plane": cr, "h": 1, "v": 1, "qt": qt_c, "tab": 1},
            ]

    dc_tabs = [
        _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = c["plane"]
        c["plane"] = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )

    out = bytearray()
    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        block = c["plane"][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, c["qt"], dc_tabs[c["tab"]],
                            ac_tabs[c["tab"]], pred[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.buf
    scan_bytes = bytes(out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    ncomp = len(comps)
    hdr = bytearray(b"\xff\xd8")  # SOI
    hdr += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    hdr += seg(0xFFDB, bytes([0]) + bytes(qt_l.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        hdr += seg(0xFFDB, bytes([1]) + bytes(qt_c.ravel()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], 0 if ci == 0 else 1])
    hdr += seg(0xFFC0, sof)

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    hdr += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    hdr += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        hdr += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        hdr += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        hdr += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    hdr += seg(0xFFDA, sos)
    return bytes(hdr) + scan_bytes + b"\xff\xd9"  # EOI


# --------------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync_restart
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        # Drop already-consumed high bits (read_bit only decrements
        # nbits); unbounded acc makes every shift copy the whole scan.
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Consume a pending RSTn and realign to the byte AFTER it."""
        # drop pad bits, advance past the marker bytes
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                return
            p += 1
        raise ValueError("expected restart marker")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _decode_huff(br: "_BitReader", lookup) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lookup.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def decode_jpeg(data: bytes):
    """Baseline JFIF bytes → RGB uint8 (H, W, 3) (grayscale broadcasts).
    Supports sequential baseline (SOF0) with 8-bit samples, 1 or 3
    components, arbitrary sampling factors, restart intervals. Raises
    ValueError on progressive/arithmetic/12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qts = {}
    dc_lookup = {}
    ac_lookup = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_pos = None
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, np.int32)
                tab[ZIGZAG] = np.frombuffer(
                    body[i + 1:i + 65], np.uint8
                ).astype(np.int32)
                qts[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            if nc not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) would silently fall into
                # the 3-plane YCbCr branch and return wrong colors.
                raise ValueError(
                    f"unsupported component count {nc} (grayscale or "
                    "YCbCr only)"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if tc == 0:
                    dc_lookup[th] = _huff_lookup(bits, vals)
                else:
                    ac_lookup[th] = _huff_lookup(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if comps is None or scan_pos is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan_comps:
        order.append((by_id[cs], td, ta))

    # MJPEG ("motion JPEG", the OpenDML AVI spec) allows frames to OMIT
    # DHT segments entirely; decoders shall then use the T.81 Annex K.3
    # typical tables (destination 0 = luma, 1 = chroma). Filling only
    # missing destinations keeps streams that DO carry tables exact.
    for _ci, td, ta in order:
        if td not in dc_lookup:
            b_, v_ = ((DC_LUMA_BITS, DC_LUMA_VALS) if td == 0
                      else (DC_CHROMA_BITS, DC_CHROMA_VALS))
            dc_lookup[td] = _huff_lookup(b_, v_)
        if ta not in ac_lookup:
            b_, v_ = ((AC_LUMA_BITS, AC_LUMA_VALS) if ta == 0
                      else (AC_CHROMA_BITS, AC_CHROMA_VALS))
            ac_lookup[ta] = _huff_lookup(b_, v_)

    br = _BitReader(data, scan_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, td, ta in order:
                c = comps[ci]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = _decode_huff(br, dc_lookup[td])
                        diff = _extend(br.receive(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_lookup[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * qts[c["tq"]].ravel()[ZIGZAG]
                        block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    # upsample each component to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
