"""AVI video codec (uncompressed DIB + motion-JPEG) — pure numpy +
stdlib, no pyav/ffmpeg.

The video analogue of the BMP/PCM-WAV/baseline-JPEG story: the RIFF/AVI
container (Microsoft's public AVI spec) with BI_RGB uncompressed 24-bit
DIB frames is fully decodable with no codec library — container box
walk + the same bottom-up padded-BGR pixel layout BMP uses. Since round
6 the first COMPRESSED codec is real too: MJPG (motion JPEG per the
OpenDML AVI spec — every '00dc' chunk an independent baseline JPEG)
decodes through ``operators.jpeg``'s pure-numpy T.81 kernel, including
DHT-less frames via the Annex-K default tables OpenDML mandates.
Inter-frame codecs (H.264/VP9/…) still raise ``ValueError`` and stay
honestly stubbed at the ``multimodal.frame_sample`` level (pyav absent,
re-probed round 6).

``encode_avi`` writes a minimal single-video-stream file (avih + strh +
strf + movi '00db' chunks; no idx1 — our reader and any spec-compliant
demuxer that tolerates a missing optional index handle it) so fixtures
are deterministic and self-contained.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


MJPG_FOURCC = 0x47504A4D  # "MJPG" little-endian, biCompression value


def encode_avi(frames, fps: int = 10, codec: str = "rgb",
               quality: int = 90) -> bytes:
    """List of RGB uint8 (H, W, 3) arrays (same dims) → AVI bytes with
    one video stream. ``codec='rgb'`` writes uncompressed 24-bit DIB
    '00db' chunks; ``codec='mjpg'`` writes motion-JPEG '00dc' chunks
    (each frame an independent baseline JPEG from ``operators.jpeg`` —
    the OpenDML MJPEG layout, decodable with no codec library)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    if codec not in ("rgb", "mjpg"):
        raise ValueError(f"unsupported codec {codec!r}")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("frames must share dimensions")
    if codec == "mjpg":
        from .jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        frame_bytes = max(len(p) for p in payloads)
    else:
        payloads = None
        stride = (w * 3 + 3) & ~3
        frame_bytes = stride * h

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags (AVIF_HASINDEX off, interleaved off)
        len(frames),               # dwTotalFrames
        0, 1,                      # dwInitialFrames, dwStreams
        frame_bytes,               # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG" if codec == "mjpg" else b"DIB ",
        0, 0, 0, 0,
        1, fps,                    # dwScale, dwRate → fps
        0, len(frames),            # dwStart, dwLength
        frame_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,           # BITMAPINFOHEADER
        MJPG_FOURCC if codec == "mjpg" else 0,  # biCompression
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b""
    if codec == "mjpg":
        for p in payloads:
            movi_chunks += _chunk(b"00dc", p)
    else:
        for f in frames:
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
            movi_chunks += _chunk(b"00db", rows.tobytes())
    riff_body = b"AVI " + hdrl + _list(b"movi", movi_chunks)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes):
    """AVI bytes → (fps float, list of RGB uint8 (H, W, 3) frames).
    Supports BI_RGB 24-bit uncompressed and MJPG motion-JPEG video
    streams ('00db'/'00dc' chunks of the first vids stream); inter-frame
    codecs raise."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")

    w = h = None
    fps = 0.0
    compression = None
    bitcount = None
    frames = []
    # Streams are numbered by strl order in hdrl; only the FIRST vids
    # stream's strf and frame chunks count — an audio strl preceding the
    # video one must not have its WAVEFORMATEX read as BITMAPINFOHEADER.
    stream_idx = -1
    vids_idx = None

    def walk(pos: int, end: int, in_movi: bool):
        nonlocal w, h, fps, compression, bitcount, stream_idx, vids_idx
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                break
            if fourcc == b"LIST":
                ltype = data[body_start:body_start + 4]
                walk(body_start + 4, body_end, ltype == b"movi" or in_movi)
            elif fourcc == b"strh":
                stream_idx += 1
                fcc_type = data[body_start:body_start + 4]
                if fcc_type == b"vids" and vids_idx is None:
                    vids_idx = stream_idx
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20:body_start + 28]
                    )
                    if scale:
                        fps = rate / scale
            elif (fourcc == b"strf" and stream_idx == vids_idx
                  and bitcount is None and size >= 16):
                (_bisize, bw, bh, _planes, bc, comp) = struct.unpack(
                    "<IiiHHI", data[body_start:body_start + 20]
                )
                w, h, bitcount, compression = bw, abs(bh), bc, comp
            elif (in_movi and fourcc[2:4] in (b"db", b"dc") and size
                  and vids_idx is not None
                  and fourcc[:2] == b"%02d" % vids_idx):
                if compression == MJPG_FOURCC:
                    # motion JPEG: every chunk is an independent baseline
                    # JPEG (OpenDML); our pure-numpy T.81 decoder handles
                    # it, including DHT-less frames (Annex-K defaults).
                    from .jpeg import decode_jpeg

                    frames.append(
                        decode_jpeg(bytes(data[body_start:body_end]))
                    )
                    pos = body_end + (size & 1)
                    continue
                if compression not in (0, None):
                    raise ValueError(
                        f"compressed AVI stream (biCompression="
                        f"{compression}) needs a codec library"
                    )
                if bitcount != 24 or not w or not h:
                    raise ValueError(
                        f"unsupported AVI frame format (bits={bitcount})"
                    )
                stride = (w * 3 + 3) & ~3
                if size < stride * h:
                    raise ValueError("truncated AVI frame")
                rows = np.frombuffer(
                    data, np.uint8, stride * h, body_start
                ).reshape(h, stride)
                img = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
                frames.append(np.ascontiguousarray(img))
            pos = body_end + (size & 1)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0], False)
    if not frames:
        raise ValueError("no decodable video frames")
    return (fps or 1.0), frames
