"""From-scratch image codecs — pure numpy, no image libraries.

Real decoders for the two classic uncompressed container formats, built
the same way operators/audio.py built its WAV/µ-law codec: parse the
header fields from the spec, slice the pixel payload with numpy, never
loop per pixel.

- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), uncompressed
  (BI_RGB) 24- or 32-bit; rows padded to 4-byte boundaries; bottom-up
  (positive height) and top-down (negative height) orders. Public spec:
  the Windows BMP file format.
- PPM/PGM: binary P6 (RGB) and P5 (grayscale) with whitespace/comment
  tokenized headers, maxval ≤ 255. Public spec: netpbm formats.

Decoded form is ``np.ndarray`` of shape (H, W, 3) or (H, W, 1), dtype
uint8. Encoders exist so tests can round-trip bit-exactly and fixtures
need no binary blobs in the repo.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP ---------------------------------------------------------------------

_BI_RGB = 0


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → 24-bit bottom-up BI_RGB BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = img.shape
    row_len = w * 3
    pad = (-row_len) % 4
    stride = row_len + pad
    # BGR order, bottom-up rows, padded
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_len] = bgr.reshape(h, row_len)
    pixel_data = rows.tobytes()
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB. Supports BI_RGB 24/32-bit,
    bottom-up and top-down."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != _BI_RGB:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp}")
    if w <= 0 or h_signed == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(rows[:, :, 2::-1][:, :, :3])


# --- PPM / PGM ---------------------------------------------------------------


def _pnm_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """First ``n_tokens`` whitespace/comment-separated integer tokens after
    the magic; returns (values, payload_offset)."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < n_tokens:
        if i >= len(data):
            raise ValueError("truncated PNM header")
        c = data[i : i + 1]
        if c == b"#":
            nl = data.find(b"\n", i)
            if nl == -1:
                raise ValueError("unterminated PNM comment")
            i = nl + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tok = data[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad PNM header token {tok!r}")
            vals.append(int(tok))
            i = j
    # exactly ONE whitespace byte separates header from payload
    if i >= len(data) or not data[i : i + 1].isspace():
        raise ValueError("missing PNM header terminator")
    return vals, i + 1


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6; (H, W, 1) or (H, W) → binary P5."""
    if img.dtype != np.uint8:
        raise ValueError("encode_ppm expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch == 3:
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    if ch == 1:
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError(f"unsupported channel count {ch}")


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 → (H, W, 3) uint8; P5 → (H, W, 1) uint8. maxval ≤ 255 only."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM stream")
    (w, h, maxval), off = _pnm_tokens(data, 3)
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise ValueError("unsupported PNM parameters")
    nch = 3 if magic == b"P6" else 1
    need = w * h * nch
    if len(data) - off < need:
        raise ValueError("truncated PNM payload")
    arr = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return arr.reshape(h, w, nch)


# --- dispatch -----------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the container magic and decode. (H, W, C) uint8, C ∈ {1, 3}."""
    if data is None or len(data) < 2:
        raise ValueError("empty image payload")
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    raise ValueError(f"unknown image magic {data[:2]!r}")
