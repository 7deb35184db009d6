"""Self-contained media codecs for the multimodal columns (K7).

No PIL/librosa/av in this container — but three ubiquitous formats are
fully decodable from their public specs with struct+numpy alone, which
turns the multimodal decode path from a stub into a real one:

- **PPM/PGM** (netpbm P5/P6): ASCII header + raw samples,
- **BMP** (Windows BITMAPINFOHEADER, 24-bit uncompressed BI_RGB,
  bottom-up rows padded to 4 bytes),
- **PNG** (ISO/IEC 15948: zlib-deflated scanlines, filters 0-4, 8-bit
  grey/RGB/RGBA, non-interlaced — stdlib zlib + struct only),
- **WAV** (RIFF, PCM 8/16/32-bit integer + IEEE float32).

Each has an encoder twin so resize/re-encode and round-trip tests run
with zero external fixtures. ``nearest_resize`` is a pure-numpy
index-map resize — the deterministic choice for dedup/fingerprint
pipelines (bilinear would vary with float rounding across platforms).

``multimodal`` registers these into its ``CODECS`` / ``ENCODERS`` /
``AUDIO_CODECS`` registries at import (see
``multimodal._register_builtin_codecs``), so ``resize_images`` executes
the REAL decode→resize→re-encode path for these media types and falls
back to the documented stand-in otherwise. This module stays free of
Spark/multimodal imports so UDF workers can unpickle it cheaply.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- netpbm


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm → uint8 array (H,W,3)/(H,W)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("netpbm: bad magic (only binary P5/P6 supported)")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between header tokens
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("netpbm: 16-bit samples unsupported")
    ch = 3 if data[:2] == b"P6" else 1
    arr = np.frombuffer(data, np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"netpbm: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# -------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 RGB (H,W,3). Bottom-up and
    top-down (negative height) variants both handled."""
    if data[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    _planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP: only 24-bit BI_RGB supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP: need (H,W,3) RGB")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = arr[..., ::-1]
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = bgr[::-1].reshape(h, w * 3)  # bottom-up
    pix = body.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    )
    return header + pix


# -------------------------------------------------------------- PNG
# Pure-stdlib PNG (ISO/IEC 15948 / RFC 2083): zlib inflate/deflate +
# struct chunk framing. Decode supports 8-bit greyscale/RGB/RGBA,
# filters 0-4, non-interlaced; encode emits filter-0 rows.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (H,W) grey / (H,W,3) RGB / (H,W,4) RGBA.
    8-bit, non-interlaced; all five row filters reconstructed."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos + 12 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: {ctype.decode('latin1')} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2, 6) or comp or filt or interlace:
        raise ValueError(
            "PNG: only 8-bit grey/RGB/RGBA, non-interlaced supported "
            f"(depth={depth}, color={color}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT size mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        ftype, line = raw[r, 0], raw[r, 1:].copy()
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-channel prefix sum wraps mod 256
            rec = np.cumsum(line.reshape(w, ch), axis=0, dtype=np.uint8).reshape(
                stride
            )
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential recurrence
            rec = np.zeros(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 3:
                    rec[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown row filter {ftype}")
        out[r] = rec
        prev = out[r]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (H,W)/(H,W,3)/(H,W,4) → PNG (filter 0, one IDAT)."""
    import zlib

    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"PNG: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    body = arr.reshape(h, w * ch)
    scanlines = np.zeros((h, w * ch + 1), np.uint8)
    scanlines[:, 1:] = body
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 9))
        + _png_chunk(b"IEND", b"")
    )


# -------------------------------------------------------------- WAV


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (float64 samples shaped (n, channels) scaled to
    [-1, 1], sample_rate). Integer PCM 8/16/32-bit and float32."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF header")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif cid == b"data":
            raw = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 3 and bits == 32:
        s = np.frombuffer(raw, "<f4").astype(np.float64)
    elif audio_fmt == 1 and bits == 16:
        s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        s = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 1 and bits == 8:
        s = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"WAV: unsupported format {audio_fmt}/{bits}-bit")
    return s.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1,1] → 16-bit PCM WAV."""
    arr = np.asarray(samples, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


# ------------------------------------------------------------ resize


def nearest_resize(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize via integer index maps."""
    h, w = arr.shape[:2]
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return arr[yi][:, xi]
