"""Pure-Python codecs for PPM P6, 24-bit BMP, and zlib-compressed PNG
(baseline JPEG lives in functions/jpeg.py and dispatches through here).

The multimodal operators treat media as opaque binary columns and run
decode kernels as Arrow-batched `mapInPandas` functions. This container
ships no codec library (no PIL), but none is needed for these formats:
PPM/BMP are a small header plus raw pixel bytes, PNG's DEFLATE stream is
stdlib zlib, and JPEG (baseline AND progressive) is Huffman + IDCT
(functions/jpeg.py) —
so the decode step is REAL (header grammar, CRC verification, scanline
filter reconstruction, entropy decode, pixel extraction, re-encoding)
for all four, and WebP lossless (VP8L) is prefix codes + transforms
(functions/webp.py, r12). Formats that genuinely need an external codec
(lossy VP8 WebP, AVIF, ...) still fall through to the documented
codec-boundary stub in operators/multimodal.py.

All functions are bytes-in/bytes-out with explicit (width, height,
pixels) tuples — `pixels` is the row-major RGB byte string
(len == width * height * 3) regardless of the container format's own
row order or channel order.
"""

from __future__ import annotations

import struct


class ImageFormatError(ValueError):
    """Payload is not a decodable image of the claimed format."""


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from row-major RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from a binary PPM. Handles the full header
    grammar: arbitrary whitespace between tokens and '#' comments."""
    if data[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageFormatError("truncated PPM header")
        tok = data[start:pos]
        if not tok.isdigit():  # fuzz-found (r11): a corrupt header token
            # must raise the TYPED error, not int()'s bare ValueError
            raise ImageFormatError(f"bad PPM header token {tok!r}")
        tokens.append(int(tok))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    width, height, maxval = tokens
    if maxval != 255:
        raise ImageFormatError(f"unsupported PPM maxval {maxval}")
    if width <= 0 or height <= 0 or width * height > 1 << 26:
        raise ImageFormatError(f"implausible PPM dimensions {width}x{height}")
    need = width * height * 3
    pixels = data[pos : pos + need]
    if len(pixels) != need:
        raise ImageFormatError("truncated PPM pixel data")
    return width, height, pixels


# ------------------------------------------------------------ BMP (24-bit)

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_DIB_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from row-major RGB bytes —
    bottom-up rows, BGR channel order, rows padded to 4 bytes, exactly as
    the format specifies."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = pixels[base + x * 3 : base + x * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    body = b"".join(rows)
    offset = _BMP_HEADER.size + _DIB_HEADER.size
    head = _BMP_HEADER.pack(b"BM", offset + len(body), 0, 0, offset)
    dib = _DIB_HEADER.pack(
        _DIB_HEADER.size, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + dib + body


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from a 24-bit uncompressed BMP. Handles both
    bottom-up (positive height) and top-down (negative height) layouts."""
    if data[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    if len(data) < _BMP_HEADER.size + _DIB_HEADER.size:  # fuzz-found (r11):
        # unpack_from raises bare struct.error on a truncated header
        raise ImageFormatError("truncated BMP header")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    (dib_size, width, height, _planes, bpp, compression, *_rest) = _DIB_HEADER.unpack_from(
        data, _BMP_HEADER.size
    )
    if dib_size < _DIB_HEADER.size or bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"unsupported BMP variant (dib={dib_size}, bpp={bpp}, comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0 or width * height > 1 << 26:
        # corrupt dims must raise, not allocate a multi-GiB buffer
        raise ImageFormatError(f"implausible BMP dimensions {width}x{height}")
    stride = width * 3 + ((-(width * 3)) % 4)
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = offset + src_row * stride
        row = data[base : base + width * 3]
        if len(row) != width * 3:
            raise ImageFormatError("truncated BMP pixel data")
        dst = y * width * 3
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# ---------------------------------------------------------- PNG (zlib)
#
# A COMPRESSED format decoded with nothing but the standard library:
# chunk grammar + CRC verification, zlib inflate of the IDAT stream, and
# the full five-filter scanline reconstruction (None/Sub/Up/Average/
# Paeth). 8-bit truecolor (type 2) and truecolor+alpha (type 6, alpha
# dropped) — the shapes a training-data pipeline actually meets; palette/
# grayscale/interlaced variants raise the typed error. The encoder
# applies filters CYCLICALLY (row y gets filter y % 5), so a fixture
# round-trip exercises every unfilter path — any filter-math defect
# breaks the closed-form oracle, not just a lucky subset.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit truecolor PNG from row-major RGB bytes; row y is stored with
    scanline filter y % 5 so decoders must implement all five."""
    import zlib

    if len(pixels) != width * height * 3:
        raise ImageFormatError("pixel buffer does not match dimensions")
    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        f = y % 5
        raw.append(f)
        for i in range(stride):
            x = row[i]
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - _paeth(left, up, ul)
            raw.append(v & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from an 8-bit truecolor (or truecolor+alpha)
    PNG: chunk walk with CRC check, zlib inflate, five-filter scanline
    reconstruction. Anything else (palette, grayscale, 16-bit,
    interlaced, truncated) raises ImageFormatError."""
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ImageFormatError("not a PNG payload")
    pos, width = 8, None
    height = channels = 0
    saw_iend = False
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ImageFormatError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ImageFormatError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype_id not in (2, 6) or comp or filt or interlace:
                raise ImageFormatError(
                    f"unsupported PNG variant (depth={depth}, type={ctype_id}, "
                    f"interlace={interlace})"
                )
            channels = 3 if ctype_id == 2 else 4
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if width is None:
        raise ImageFormatError("PNG has no IHDR")
    if not saw_iend:
        raise ImageFormatError("truncated PNG: no IEND chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageFormatError(f"PNG IDAT inflate failed: {exc}") from exc
    bpp = channels
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ImageFormatError("PNG pixel data does not match dimensions")
    out = bytearray(height * stride)
    prior = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f > 4:
            raise ImageFormatError(f"bad PNG scanline filter {f}")
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if f == 1:
                line[i] = (line[i] + left) & 0xFF
            elif f == 2:
                line[i] = (line[i] + up) & 0xFF
            elif f == 3:
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
            elif f == 4:
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    if channels == 4:  # drop alpha to honor the RGB contract
        rgb = bytearray(width * height * 3)
        for p in range(width * height):
            rgb[p * 3 : p * 3 + 3] = out[p * 4 : p * 4 + 3]
        return width, height, bytes(rgb)
    return width, height, bytes(out)


# ------------------------------------------------------------- dispatch


def sniff_format(data: bytes) -> str | None:
    """'ppm' / 'bmp' / 'png' / 'jpeg' / 'gif' / 'webp' for the natively
    decodable formats, else None. WebP is claimed only when the RIFF
    container carries a VP8L (lossless) chunk — lossy VP8 payloads return
    None and fall to the documented codec boundary."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import has_vp8l

        if has_vp8l(data):
            return "webp"
    return None


def decode_any(data: bytes) -> tuple[str, int, int, bytes]:
    """(format, width, height, rgb) for a natively decodable payload;
    ImageFormatError for anything else (caller decides whether a codec
    library fallback exists). JPEG covers both Huffman profiles
    (baseline sequential + progressive, r10); GIF covers 87a/89a incl.
    interlace and local palettes (first frame, r11); WebP covers the full
    VP8L lossless bitstream (r12); arithmetic/lossless/hierarchical JPEG
    and lossy-VP8 WebP raise, preserving the documented codec boundary."""
    fmt = sniff_format(data)
    if fmt == "ppm":
        return ("ppm", *decode_ppm(data))
    if fmt == "bmp":
        return ("bmp", *decode_bmp(data))
    if fmt == "png":
        return ("png", *decode_png(data))
    if fmt == "jpeg":
        from .jpeg import decode_jpeg  # numpy import deferred to first use

        return ("jpeg", *decode_jpeg(data))
    if fmt == "gif":
        from .gif import decode_gif

        return ("gif", *decode_gif(data))
    if fmt == "webp":
        from .webp import decode_webp

        return ("webp", *decode_webp(data))
    raise ImageFormatError(
        "payload is not a natively decodable PPM/BMP/PNG/JPEG/GIF/WebP-lossless image"
    )


def encode(fmt: str, width: int, height: int, pixels: bytes) -> bytes:
    if fmt == "ppm":
        return encode_ppm(width, height, pixels)
    if fmt == "bmp":
        return encode_bmp(width, height, pixels)
    if fmt == "png":
        return encode_png(width, height, pixels)
    if fmt == "jpeg":
        from .jpeg import encode_jpeg_baseline

        return encode_jpeg_baseline(width, height, pixels)
    if fmt == "gif":
        from .gif import encode_gif

        return encode_gif(width, height, pixels)
    if fmt == "webp":
        from .webp import encode_webp

        return encode_webp(width, height, pixels)
    raise ImageFormatError(f"unsupported encode format {fmt!r}")


def resize_nearest(
    width: int, height: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major RGB buffer — the standard
    floor(dst * src / new) index mapping."""
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = y * height // new_h
        src_base = sy * width * 3
        dst_base = y * new_w * 3
        for x in range(new_w):
            sx = x * width // new_w
            out[dst_base + x * 3 : dst_base + x * 3 + 3] = pixels[
                src_base + sx * 3 : src_base + sx * 3 + 3
            ]
    return bytes(out)
