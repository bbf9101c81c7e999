"""Pure-stdlib GIF codec (GIF87a/GIF89a): LZW decode/encode, interlace,
transparency, multi-frame animation with disposal compositing.

Engine-new scope (the reference's image path,
``DataStructure/Library.fs:70-126``, resizes mail attachments and has no
GIF support): a web crawl that stores image/video payloads as opaque
binary columns (SURVEY §2 multimodal) meets GIF constantly — it is the
one major legacy web image format the BMP/PNG/JPEG kernel family didn't
cover, and animated GIF doubles as the second real *video-ish* format
next to MJPEG-in-AVI. Implemented from the public GIF89a specification
(CompuServe, 1990) and the LZW scheme it normatively includes; zero
dependencies beyond numpy.

Scale notes (same contract as ``jpeg.py``/``avi.py``):

- The LZW bit accumulators are masked to their live bits after every
  extraction — the round-5 JPEG lesson: an unmasked Python bigint makes
  codec cost QUADRATIC in scan length (13.5 s → 0.13 s for one 256 px
  frame after masking).
- Decode is dictionary-bounded by the format itself (4096 codes, 12-bit
  max), so worst-case memory per frame is small and independent of
  input size; per-task cost is linear in pixels.
- These kernels run inside Arrow-batched ``mapInPandas`` tasks
  (``multimodal.image_features`` / ``frame_sample`` / ``resize_images``)
  — one payload per row, embarrassingly parallel, no shuffle; at 100 TB
  the bottleneck is the scan, not the codec dispatch.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_gif",
    "decode_gif_first",
    "decode_gif_indexed",
    "encode_gif",
    "gif_dims",
]

_MAX_CODE = 4096  # 12-bit LZW ceiling fixed by the GIF spec


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, CLEAR/END codes, 12-bit cap)


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> bytes:
    """Decode GIF-LZW ``data`` (concatenated sub-block payloads) into at
    most ``n_expected`` index bytes. ``mcs`` is the LZW minimum code size
    from the stream (2..8)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1

    out = bytearray()
    # dictionary: code -> bytes; roots are single indices
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n_data = len(data)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n_data:
                # truncated stream: tolerate (browsers do) — return what
                # decoded; caller checks expected length
                return bytes(out)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        # mask to live bits: unbounded Python-int accumulators go
        # quadratic (see module docstring)
        acc &= (1 << nbits) - 1
        nbits -= width

        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            if len(table) < _MAX_CODE:
                table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_expected])


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Encode index bytes as GIF-LZW (returns the raw code stream; the
    caller wraps it into 255-byte sub-blocks)."""
    clear = 1 << mcs
    end = clear + 1

    # pass 1: LZW codes ((prefix_code, next_index) keyed dict)
    codes = [clear]
    table: dict = {}
    next_free = clear + 2
    it = iter(indices)
    c = next(it, None)
    if c is None:
        codes.append(end)
    else:
        for k in it:
            key = (c, k)
            hit = table.get(key)
            if hit is not None:
                c = hit
                continue
            codes.append(c)
            if next_free < _MAX_CODE:
                table[key] = next_free
                next_free += 1
            else:
                codes.append(clear)
                table = {}
                next_free = clear + 2
            c = k
        codes.append(c)
        codes.append(end)

    # pass 2: bit-pack, simulating the DECODER's width schedule exactly
    # (it widens after adding the entry for each post-first data code),
    # so encoder/decoder width transitions can never disagree
    out = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1
    nf = clear + 2
    m = 0  # data codes since the last clear
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc &= (1 << max(nbits - 8, 0)) - 1  # mask live bits
            nbits -= 8
        if code == clear:
            width = mcs + 1
            nf = clear + 2
            m = 0
            continue
        m += 1
        if m >= 2 and nf < _MAX_CODE:
            nf += 1
            if nf == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows, h: int):
    """Reorder interlaced row indices: pass k writes rows start::step."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = [None] * h
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def _subblocks(data: bytes, pos: int):
    """Concatenate data sub-blocks starting at ``pos``; returns
    (payload, next_pos)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        pos += n


def gif_dims(data: bytes):
    """(width, height) from the logical screen descriptor (cheap probe)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h = struct.unpack_from("<HH", data, 6)
    return w, h


def _walk_images(data: bytes):
    """Parse header + blocks; returns ``(sw, sh, gct, bg_index, images)``
    where each image is a dict with the decoded (deinterlaced) index
    array plus placement/LCT/graphic-control fields."""
    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    images = []
    transparent = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                delay_ms = struct.unpack_from("<H", payload, 1)[0] * 10
                transparent = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")

        # image descriptor
        left, top, iw, ih = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        raw = _lzw_decode(mcs, lzw, iw * ih)
        if len(raw) < iw * ih:
            raise ValueError("GIF: LZW data shorter than image")
        idx = np.frombuffer(raw, np.uint8).reshape(ih, iw)
        if ipacked & 0x40:
            idx = np.asarray(_deinterlace(list(idx), ih))
        images.append(
            {
                "left": left, "top": top, "idx": idx, "lct": lct,
                "transparent": transparent, "disposal": disposal,
                "delay_ms": delay_ms,
            }
        )
        transparent = None
        disposal = 0
        delay_ms = 0

    if not images:
        raise ValueError("GIF: no image data")
    return sw, sh, gct, bg_index, images


def decode_gif(data: bytes):
    """Decode a (possibly animated) GIF into composited full-screen RGB
    frames.

    Returns ``(frames, delays_ms)``: ``frames`` is a list of
    ``(H, W, 3)`` uint8 numpy arrays on the logical screen —
    transparency and disposal methods 0/1 (keep), 2 (restore
    background), 3 (restore previous) are applied per the GIF89a
    graphic-control extension; ``delays_ms`` is the per-frame delay
    (0 for still images / GIF87a)."""
    import numpy as np

    sw, sh, gct, bg_index, images = _walk_images(data)
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    screen = np.empty((sh, sw, 3), np.uint8)
    screen[:] = bg_rgb

    frames = []
    delays = []
    for im in images:
        pal = im["lct"] if im["lct"] is not None else gct
        if pal is None:
            raise ValueError("GIF: image has no color table")
        idx = np.minimum(im["idx"], len(pal) - 1)  # clamp corrupt indices
        rgb = pal[idx]
        ih, iw = idx.shape
        top, left = im["top"], im["left"]

        before = screen.copy() if im["disposal"] == 3 else None
        region = screen[top : top + ih, left : left + iw]
        if im["transparent"] is not None:
            opaque = idx != im["transparent"]
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(screen.copy())
        delays.append(im["delay_ms"])

        if im["disposal"] == 2:
            screen[top : top + ih, left : left + iw] = bg_rgb
        elif im["disposal"] == 3 and before is not None:
            screen = before
    return frames, delays


def decode_gif_indexed(data: bytes):
    """Index-space decode for lossless in-format rewrites (resize):
    composited full-screen ``(H, W)`` uint8 index frames + the shared
    global palette + per-frame delays. Raises when a frame carries its
    own local color table (indices would refer to different palettes —
    such files go through the RGB path instead)."""
    import numpy as np

    sw, sh, gct, bg_index, images = _walk_images(data)
    if gct is None:
        raise ValueError("GIF: indexed decode needs a global color table")
    if any(im["lct"] is not None for im in images):
        raise ValueError("GIF: indexed decode cannot mix local color tables")
    screen = np.full((sh, sw), min(bg_index, len(gct) - 1), np.uint8)
    frames = []
    delays = []
    for im in images:
        idx = np.minimum(im["idx"], len(gct) - 1)
        ih, iw = idx.shape
        top, left = im["top"], im["left"]
        before = screen.copy() if im["disposal"] == 3 else None
        region = screen[top : top + ih, left : left + iw]
        if im["transparent"] is not None:
            opaque = idx != im["transparent"]
            region[opaque] = idx[opaque]
        else:
            region[:] = idx
        frames.append(screen.copy())
        delays.append(im["delay_ms"])
        if im["disposal"] == 2:
            screen[top : top + ih, left : left + iw] = min(
                bg_index, len(gct) - 1
            )
        elif im["disposal"] == 3 and before is not None:
            screen = before
    return frames, gct, delays


def decode_gif_first(data: bytes):
    """First composited frame as ``(H, W, 3)`` uint8 — the still-image
    view used by ``decode_image`` / ``image_features``."""
    frames, _ = decode_gif(data)
    return frames[0]


def encode_gif(
    frames_idx,
    palette,
    delays_ms=None,
    transparent: int | None = None,
    interlace: bool = False,
    disposal: int = 1,
) -> bytes:
    """Encode indexed frames as GIF89a (GIF is palette-based, so the
    encoder takes ``(H, W)`` uint8 index arrays + an ``(N, 3)`` palette
    rather than RGB — mirroring how a crawler would re-emit a decoded
    GIF without quantization loss). A single array is treated as a
    still; a list with ``delays_ms`` becomes an animation (NETSCAPE2.0
    loop block included when more than one frame)."""
    import numpy as np

    single = not isinstance(frames_idx, (list, tuple))
    frames = [frames_idx] if single else list(frames_idx)
    if not frames:
        raise ValueError("encode_gif: no frames")
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("encode_gif: palette must be (N<=256, 3) uint8")
    if delays_ms is None:
        delays_ms = [100] * len(frames)

    # color table size: power of two >= max(len(pal), 2)
    n_slots = 2
    while n_slots < len(pal):
        n_slots <<= 1
    gct = np.zeros((n_slots, 3), np.uint8)
    gct[: len(pal)] = pal

    h0, w0 = frames[0].shape[:2]
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w0, h0)
    out += bytes(
        [0x80 | ((n_slots.bit_length() - 2) & 0x07), 0, 0]
    )  # GCT flag + size, bg=0, aspect=0
    out += gct.tobytes()

    if len(frames) > 1:  # NETSCAPE2.0 infinite-loop application block
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    mcs = max(2, n_slots.bit_length() - 1)
    for fi, frame in enumerate(frames):
        idx = np.asarray(frame, np.uint8)
        if idx.ndim != 2:
            raise ValueError("encode_gif: frames must be (H, W) index arrays")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("encode_gif: index beyond palette")
        fh, fw = idx.shape
        if (fh, fw) != (h0, w0):
            raise ValueError("encode_gif: all frames must share dims")
        if len(frames) > 1 or transparent is not None:
            flags = (disposal & 0x07) << 2
            if transparent is not None:
                flags |= 0x01
            out += b"\x21\xf9\x04" + bytes([flags])
            out += struct.pack("<H", max(delays_ms[fi] // 10, 0))
            out += bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])  # no LCT
        rows = list(idx)
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, fh, step))
            rows = [rows[r] for r in order]
        payload = b"".join(bytes(r) for r in rows)
        out += bytes([mcs])
        stream = _lzw_encode(mcs, payload)
        for off in range(0, len(stream), 255):
            chunk = stream[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
