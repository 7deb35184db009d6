"""Self-contained media codecs for the multimodal columns (K7).

No PIL/librosa/av in this container — but three ubiquitous formats are
fully decodable from their public specs with struct+numpy alone, which
turns the multimodal decode path from a stub into a real one:

- **PPM/PGM** (netpbm P5/P6): ASCII header + raw samples,
- **BMP** (Windows BITMAPINFOHEADER, 24-bit uncompressed BI_RGB,
  bottom-up rows padded to 4 bytes),
- **PNG** (ISO/IEC 15948: zlib-deflated scanlines, filters 0-4, 8-bit
  grey/RGB/RGBA, non-interlaced — stdlib zlib + struct only),
- **GIF** (GIF87a/89a: variable-width LZW, interlacing, 89a
  transparency/disposal compositing, multi-frame animations — the
  frame-sampling path's real decoder),
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


# -------------------------------------------------------------- GIF
# GIF87a/89a per the public spec (CompuServe/W3C GIF89a specification):
# LZW-compressed palette indices in LSB-first variable-width codes,
# optional interlacing, 89a graphic-control extensions for per-frame
# transparency/disposal. Pure stdlib+numpy; the LZW inner loops are
# Python — acceptable for the Arrow-batched decode path (payloads are
# thumbnails/clips), and the per-row cost is documented in SCALE.md.


def _lzw_decode_gif(min_code_size: int, data: bytes) -> list:
    """GIF-flavor LZW: LSB-first bitstream, clear/end codes, code width
    grows when the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    code_size = min_code_size + 1
    table: list = [(i,) for i in range(clear)] + [None, None]
    prev = None
    out: list = []
    while pos + code_size <= nbits:
        code = (bits >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = [(i,) for i in range(clear)] + [None, None]
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        if prev is not None and len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode_gif(min_code_size: int, indices) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = 0
    acc_bits = 0
    chunks = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            chunks.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    def reset() -> dict:
        return {(i,): i for i in range(clear)}

    emit(clear)
    table = reset()
    next_code = end + 1
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear)
            table = reset()
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    if acc_bits:
        chunks.append(acc & 0xFF)
    return bytes(chunks)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _GIF_INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _gif_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``off``; return
    (payload, offset past the terminator)."""
    parts = []
    while True:
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        parts.append(data[off : off + n])
        off += n


def decode_gif_frames(data: bytes) -> np.ndarray:
    """All frames of a GIF as uint8 RGB (n, h, w, 3), composited on the
    logical screen per the 89a disposal rules (1/3 treated as
    draw-on-top, 2 restores the frame rect to background)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8).copy()
    frames = []
    transparent = None
    disposal = 0
    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[off]
            off += 1
            payload, off = _gif_subblocks(data, off)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[off : off + 9])
        off += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
            off += 3 * n
        if ct is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[off]
        off += 1
        lzw, off = _gif_subblocks(data, off)
        idx = np.array(
            _lzw_decode_gif(min_code, lzw)[: fw * fh], dtype=np.int32
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        rgb = ct[np.clip(idx, 0, len(ct) - 1)]
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = bg_rgb
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as uint8 RGB (h, w, 3)."""
    return decode_gif_frames(data)[0]


def encode_gif(arr: np.ndarray) -> bytes:
    """Single-frame GIF89a from uint8 RGB (h, w, 3) or grayscale
    (h, w). Builds an exact palette — payloads with more than 256
    distinct colors raise (quantization is a modeling decision the
    pipeline owner makes upstream)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) or (h, w)")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed GIF's 256")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, depth)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([min_code])
    lzw = _lzw_encode_gif(min_code, idx)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # sub-block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_frames(frames: np.ndarray) -> bytes:
    """Animated GIF89a from uint8 RGB (n, h, w, 3): one global palette
    over all frames (>256 distinct colors raise, as in ``encode_gif``),
    draw-on-top disposal, no timing metadata (the frame-sampling path
    reads frames, not delays)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("encode_gif_frames expects (n, h, w, 3)")
    n, h, w = f.shape[:3]
    flat = f.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed GIF's 256")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, depth)
    idx = idx.reshape(n, h * w)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += table.tobytes()
    for i in range(n):
        # graphic control: disposal 1 (leave in place), no transparency
        out += b"\x21\xf9\x04" + bytes([1 << 2, 0, 0, 0]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([min_code])
        lzw = _lzw_encode_gif(min_code, idx[i])
        for j in range(0, len(lzw), 255):
            chunk = lzw[j : j + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def median_cut_palette(arr: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Deterministic median-cut color quantization (Heckbert 1982):
    recursively split the color box with the widest channel range at
    its median until ``n_colors`` boxes remain; each box's mean color
    is a palette entry. Ties and orderings are all resolved by fixed
    rules (widest-range channel, lowest index first), so the palette is
    reproducible across runs and platforms — the property that matters
    for dedup/fingerprint pipelines."""
    a = np.asarray(arr, dtype=np.uint8).reshape(-1, 3)
    boxes = [a]
    while len(boxes) < n_colors:
        # split the box with the widest single-channel range
        widths = [
            (int(b.max(axis=0)[c]) - int(b.min(axis=0)[c]), -i, c)
            for i, b in enumerate(boxes)
            for c in range(3)
        ]
        width, neg_i, c = max(widths)
        if width == 0:
            break  # every box is a single color
        i = -neg_i
        b = boxes.pop(i)
        order = np.argsort(b[:, c], kind="stable")
        half = len(order) // 2
        boxes.insert(i, b[order[half:]])
        boxes.insert(i, b[order[:half]])
    pal = np.array(
        sorted(
            tuple(np.round(b.mean(axis=0)).astype(int)) for b in boxes if len(b)
        ),
        dtype=np.uint8,
    )
    return pal


def quantize_to_palette(arr: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Map every pixel to its nearest palette color (squared-L2,
    ties to the lower palette index) — returns a palettized RGB image
    ready for ``encode_gif``."""
    a = np.asarray(arr, dtype=np.int32).reshape(-1, 3)
    p = np.asarray(palette, dtype=np.int32)
    d = ((a[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
    idx = d.argmin(axis=1)
    return palette[idx].reshape(np.asarray(arr).shape).astype(np.uint8)
