"""JPEG (ITU-T T.81) codec — pure Python + numpy, no codec library.

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) DCT, 8-bit,
Huffman-coded — together the two profiles cover effectively every JFIF
camera/browser/crawl JPEG. Handles 1- and 3-component images, sampling
factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI/RSTn),
byte stuffing, MCU edge padding/cropping, and for progressive: spectral
selection bands, successive approximation (DC + AC first/refinement
scans, T.81 Annex G / the well-known libjpeg phuff algorithms), EOB runs,
and non-interleaved per-component scan geometry. Arithmetic coding,
12-bit precision, lossless (SOF3), and hierarchical modes raise a typed
ImageFormatError — those stay behind the documented codec boundary.

Both profiles decode through ONE engine: headers are parsed into a scan
list, every scan deposits (possibly partial-precision) coefficients into
per-component zigzag buffers, and a single vectorized numpy IDCT pass
reconstructs all blocks at once — baseline is simply the one-scan
(Ss=0, Se=63, Ah=Al=0) special case.

Encoders: baseline sequential (unit quantisation tables — a
block-constant image round-trips EXACTLY, giving the gated
mm_image_decode fixture a closed-form pixel oracle; arbitrary images
round-trip within ±2/channel, pytest-bounded) and progressive (same unit
tables; fixed scan script with successive approximation Al=1 -> refine,
spectral band splits, and EOB-run accumulation — the refinement scans
restore full precision, so block-constant images again round-trip
EXACTLY and feed the same closed-form oracle).

Malformed/truncated payloads never escape as IndexError/struct.error/
KeyError: decode_jpeg re-raises them as ImageFormatError (the module's
typed-error contract).

Reference scope: beyond-reference (the reference pipeline has no media
codecs); public T.81/JFIF specification semantics throughout.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageFormatError

# zigzag scan order: ZZ[k] = (row, col) of the k-th coefficient
_ZZ: list[tuple[int, int]] = []
for _d in range(15):
    _rows = list(range(max(0, _d - 7), min(_d, 7) + 1))
    for _r in _rows if _d % 2 == 1 else reversed(_rows):
        _ZZ.append((_r, _d - _r))
_ZZR = np.array([r for r, c in _ZZ])
_ZZC = np.array([c for r, c in _ZZ])

# orthonormal DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1)u*pi/16);
# spatial = A.T @ coeffs @ A, coeffs = A @ spatial @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ------------------------------------------------------------------ decode


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.
    Stops at any non-stuffing marker; RSTn markers are consumed by
    `restart()`. The buffer holds at most ONE byte (refilled only when
    empty), so memory/time stay O(1) per bit regardless of stream length
    (the r9 form accumulated every consumed byte into one growing int —
    O(n^2) on camera-sized payloads, ADVICE r9)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: only restart() may cross
                raise ImageFormatError("entropy data ended at restart marker")
            else:
                raise ImageFormatError("entropy data ended at marker")
        else:
            self.pos += 1
        self.bitbuf = b  # _fill only runs when nbits == 0: buffer stays <= 8 bits
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageFormatError("invalid Huffman code in entropy data")

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n % 8):
            raise ImageFormatError("missing restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): a `size`-bit magnitude with a
    leading 0 bit encodes a negative value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """Index of the next real marker's 0xFF at/after pos, skipping entropy
    data, stuffed 0xFF00 pairs and RSTn markers."""
    while True:
        i = data.find(b"\xff", pos)
        if i < 0:
            raise ImageFormatError("truncated JPEG: no trailing marker")
        nxt = data[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos = i + 2
            continue
        return i


def _dec_dc_first(reader, dc_tbl, cof, pred: int, al: int) -> int:
    size = reader.decode_symbol(dc_tbl)
    pred += _extend(reader.receive(size), size)
    cof[0] = pred << al  # python << on negatives is arithmetic, as required
    return pred


def _dec_dc_refine(reader, cof, al: int) -> None:
    if reader.read_bit():
        cof[0] = int(cof[0]) | (1 << al)  # two's-complement |= works for < 0


def _dec_ac_first(reader, ac_tbl, cof, ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC first scan (T.81 G.1.2.2 / baseline F.2.2.2 when
    al=0, band 1..63). Returns the updated EOB-run counter."""
    if eobrun > 0:
        return eobrun - 1  # this block is inside a pending end-of-band run
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tbl)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run != 15:  # EOBn: run of 2^run (+ extra) end-of-band blocks
                eobrun = 1 << run
                if run:
                    eobrun += reader.receive(run)
                return eobrun - 1  # current block is a member of the run
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ImageFormatError("AC run past band end")
        cof[k] = _extend(reader.receive(size), size) << al
        k += 1
    return 0


def _dec_ac_refine(reader, ac_tbl, cof, ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (T.81 G.1.2.3): newly-nonzero coefficients arrive as (run,1) codes,
    every already-nonzero coefficient crossed contributes one correction
    bit. Returns the updated EOB-run counter."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            run, size = rs >> 4, rs & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.receive(run)
                    break  # rest of this block handled by the EOB logic below
                # ZRL: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ImageFormatError("bad AC refinement code")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                t = int(cof[k])
                if t != 0:
                    if reader.read_bit() and (t & p1) == 0:
                        cof[k] = t + (p1 if t >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                cof[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB region: correction bits for nonzero history only
            t = int(cof[k])
            if t != 0:
                if reader.read_bit() and (t & p1) == 0:
                    cof[k] = t + (p1 if t >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes) from a baseline or progressive
    JPEG. Truncated/malformed payloads raise ImageFormatError (never a
    raw IndexError/struct.error/KeyError — ADVICE r9)."""
    try:
        return _decode_jpeg(data)
    except ImageFormatError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ImageFormatError(
            f"truncated or malformed JPEG ({type(exc).__name__})"
        ) from exc


def _decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    if data[:3] != b"\xff\xd8\xff":
        raise ImageFormatError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    width = height = 0
    restart_interval = 0
    scans: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                tbl = np.zeros(64)
                for k in range(64):
                    if pq:
                        val = struct.unpack(">H", seg[p : p + 2])[0]
                        p += 2
                    else:
                        val = seg[p]
                        p += 1
                    tbl[k] = val  # kept in zigzag order for the coeff buffers
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = seg[p + 17 : p + 17 + nvals]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, values)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise ImageFormatError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * i]))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                "only baseline/progressive Huffman JPEG supported (arithmetic/"
                "lossless/hierarchical stay behind the codec boundary)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: record the scan, then skip its entropy data
            if not comps:
                raise ImageFormatError("SOS before SOF")
            ns = seg[0]
            members = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tt = seg[2 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise ImageFormatError("SOS references unknown component")
                # snapshot table refs NOW: later DHT segments may redefine ids
                members.append(
                    (ci, huff_dc.get(tt >> 4), huff_ac.get(tt & 0xF))
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            scans.append(
                {
                    "members": members,
                    "Ss": ss,
                    "Se": se,
                    "Ah": ahl >> 4,
                    "Al": ahl & 0xF,
                    "pos": pos + seglen,
                    "ri": restart_interval,
                }
            )
            pos = _next_marker(data, pos + seglen)
            continue
        # APPn/COM/DNL/others: skip
        pos += seglen
    if not comps or not scans:
        raise ImageFormatError("truncated JPEG: missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or any(c[1] < 1 or c[2] < 1 for c in comps):
        raise ImageFormatError("invalid sampling factors")
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component zigzag coefficient buffers over the full MCU block grid
    coef = [
        np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int64)
        for _, h, v, _ in comps
    ]
    for scan in scans:
        _decode_scan(data, scan, comps, coef, width, height, hmax, vmax, mcus_x, mcus_y)

    # dequantise + IDCT, one vectorized pass per component
    full = []
    for (cid, h, v, tq), cz in zip(comps, coef):
        if tq not in qt:
            raise ImageFormatError("missing quantisation table")
        dq = cz.astype(np.float64) * qt[tq]
        mat = np.zeros((*cz.shape[:2], 8, 8))
        mat[..., _ZZR, _ZZC] = dq
        spatial = np.einsum("ux,abuv,vy->abxy", _A, mat, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(
            cz.shape[0] * 8, cz.shape[1] * 8
        )
        if h < hmax or v < vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        full.append(plane[:height, :width])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
            axis=-1,
        )
    else:
        raise ImageFormatError(f"{len(full)}-component JPEG not supported")
    return width, height, rgb.tobytes()


def _decode_scan(data, scan, comps, coef, width, height, hmax, vmax, mcus_x, mcus_y):
    """Run one scan's entropy data into the coefficient buffers. Interleaved
    (multi-component) scans walk MCU order over the padded grid; single-
    component scans walk the component's OWN block grid (T.81 A.2.2 — no
    MCU padding), which is how progressive AC scans are laid out."""
    reader = _BitReader(data, scan["pos"])
    ss, se, ah, al, ri = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"], scan["ri"]
    members = scan["members"]
    for ci, dc_tbl, ac_tbl in members:
        if ss == 0 and ah == 0 and dc_tbl is None:
            raise ImageFormatError("missing DC Huffman table for scan")
        if se >= max(ss, 1) and se >= 1 and ac_tbl is None:
            raise ImageFormatError("missing AC Huffman table for scan")
    eobrun = 0
    n_rst = 0
    preds = {ci: 0 for ci, _, _ in members}

    def do_block(cof, ci, dc_tbl, ac_tbl):
        nonlocal eobrun
        if ss == 0:
            if ah == 0:
                preds[ci] = _dec_dc_first(reader, dc_tbl, cof, preds[ci], al)
            else:
                _dec_dc_refine(reader, cof, al)
        lo = max(ss, 1)
        if se >= lo:
            if ah == 0:
                eobrun = _dec_ac_first(reader, ac_tbl, cof, lo, se, al, eobrun)
            else:
                eobrun = _dec_ac_refine(reader, ac_tbl, cof, lo, se, al, eobrun)

    if len(members) == 1:
        ci, dc_tbl, ac_tbl = members[0]
        _, h, v, _ = comps[ci]
        bw = (-(-width * h // hmax) + 7) // 8
        bh = (-(-height * v // vmax) + 7) // 8
        for m in range(bw * bh):
            if ri and m and m % ri == 0:
                reader.restart(n_rst)
                n_rst += 1
                preds[ci] = 0
                eobrun = 0
            by, bx = divmod(m, bw)
            do_block(coef[ci][by, bx], ci, dc_tbl, ac_tbl)
    else:
        for m in range(mcus_x * mcus_y):
            if ri and m and m % ri == 0:
                reader.restart(n_rst)
                n_rst += 1
                for k in preds:
                    preds[k] = 0
                eobrun = 0
            my, mx = divmod(m, mcus_x)
            for ci, dc_tbl, ac_tbl in members:
                _, h, v, _ = comps[ci]
                for by in range(v):
                    for bx in range(h):
                        do_block(
                            coef[ci][my * v + by, mx * h + bx], ci, dc_tbl, ac_tbl
                        )


# ------------------------------------------------------------------ encode

# encoder-side Huffman tables: canonical, explicit in the written DHT, chosen
# for simplicity over compression — 12 DC categories at 4 bits (codes
# 0000..1011; the reserved all-ones code is never assigned), 162 AC symbols
# at 9 bits (codes 0..161 of 512; all-ones unused)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALUES = bytes(range(12))
_ENC_AC_VALUES = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALUES), 0, 0, 0, 0, 0, 0, 0]

# progressive AC table: the sequential symbols PLUS the EOBn run symbols
# (r << 4 for r = 1..14 — 0x00 is EOB1, 0xF0 stays ZRL), still all at one
# canonical 9-bit length (176 of 512 codes)
_ENC_AC_VALUES_PROG = bytes(
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS_PROG = [0] * 8 + [len(_ENC_AC_VALUES_PROG)] + [0] * 7


def _enc_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code) for the canonical table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALUES)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALUES)
_AC_CODES_PROG = _enc_codes(_ENC_AC_BITS_PROG, _ENC_AC_VALUES_PROG)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _write_block(w: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Huffman-encode one quantised block (zigzag, DC diff, AC RLE);
    returns the new DC predictor. Baseline sequential form."""
    dc = int(coeffs[0, 0])
    diff = dc - pred
    size = _category(diff)
    length, code = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    zz = [int(coeffs[_ZZ[k]]) for k in range(64)]
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]
            w.write(code, length)
            run -= 16
        size = _category(v)
        length, code = _AC_CODES[(run << 4) | size]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _pad_edges(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a plane to (ph, pw) by replicating the last row/col (standard
    MCU edge padding)."""
    h, w = plane.shape
    if h < ph:
        plane = np.vstack([plane, np.repeat(plane[-1:, :], ph - h, axis=0)])
    if w < pw:
        plane = np.hstack([plane, np.repeat(plane[:, -1:], pw - w, axis=1)])
    return plane


def _prep_planes(
    width: int,
    height: int,
    pixels: bytes,
    grayscale: bool,
    subsampling: str,
):
    """Shared encoder front half: RGB -> (planes padded to the MCU grid,
    sampling factors, mcus_x, mcus_y)."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    if subsampling not in ("444", "420"):
        raise ImageFormatError(f"unsupported subsampling {subsampling!r}")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    if grayscale:
        planes = [rgb[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            # 2x2 box-average chroma; pad odd dimensions by edge replication
            cb = _pad_edges(cb, (height + 1) // 2 * 2, (width + 1) // 2 * 2)
            cr = _pad_edges(cr, cb.shape[0], cb.shape[1])
            cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4
            cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        _pad_edges(p, mcus_y * 8 * v, mcus_x * 8 * h)
        for p, (h, v) in zip(planes, samp)
    ]
    return planes, samp, mcus_x, mcus_y


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    grayscale: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from row-major RGB bytes: unit quantisation tables
    (transform-only loss — block-constant images round-trip exactly),
    single-component grayscale (uses the R channel; pass R=G=B for true
    gray) or interleaved color at 4:4:4 or 4:2:0 (2x2-averaged chroma).
    With restart_interval > 0, emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's byte-align/reset path)."""
    planes, samp, mcus_x, mcus_y = _prep_planes(
        width, height, pixels, grayscale, subsampling
    )
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT 0: unit table
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALUES)
    out += _seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALUES)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    w = _BitWriter()
    pred = [0] * ncomp
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (plane, (h, v)) in enumerate(zip(planes, samp)):
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8]
                    coeffs = np.round(_A @ (block - 128.0) @ _A.T)
                    pred[ci] = _write_block(w, coeffs, pred[ci])
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- encode (prog)


class _ProgState:
    """Per-scan EOB-run accumulator for progressive AC encoding: `eob`
    counts pending end-of-band blocks, `be` holds correction bits that
    belong to that pending run (flushed right after the EOBn symbol,
    T.81 G.1.2.3 / the libjpeg BE buffer)."""

    def __init__(self) -> None:
        self.eob = 0
        self.be: list[int] = []


def _emit_eobrun(w: _BitWriter, st: _ProgState) -> None:
    if st.eob > 0:
        nbits = st.eob.bit_length() - 1
        length, code = _AC_CODES_PROG[nbits << 4]
        w.write(code, length)
        if nbits:
            w.write(st.eob & ((1 << nbits) - 1), nbits)
        st.eob = 0
        for b in st.be:
            w.write(b, 1)
        st.be = []


def _enc_ac_first_block(
    w: _BitWriter, st: _ProgState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """AC first scan, one block (T.81 G.1.2.2): point transform >> al,
    EOBn run accumulation across all-zero bands."""
    run = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        neg = v < 0
        t = (-v if neg else v) >> al
        if t == 0:
            run += 1
            continue
        _emit_eobrun(w, st)
        while run > 15:
            length, code = _AC_CODES_PROG[0xF0]
            w.write(code, length)
            run -= 16
        nbits = t.bit_length()
        length, code = _AC_CODES_PROG[(run << 4) | nbits]
        w.write(code, length)
        t2 = (~t if neg else t) & ((1 << nbits) - 1)
        w.write(t2, nbits)
        run = 0
        emitted = True
    if run > 0 or not emitted:  # trailing zeros (or an all-zero band) -> EOB
        st.eob += 1
        if st.eob == 0x7FFF:
            _emit_eobrun(w, st)


def _enc_ac_refine_block(
    w: _BitWriter, st: _ProgState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """AC refinement scan, one block (T.81 G.1.2.3): (run,1) codes for
    newly-nonzero coefficients, buffered correction bits for history."""
    absval = []
    eobpos = ss - 1  # index of the LAST newly-nonzero coefficient
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        absval.append(t)
        if t == 1:
            eobpos = k
    run = 0
    br: list[int] = []  # current block's buffered correction bits
    for k in range(ss, se + 1):
        t = absval[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eobpos:
            _emit_eobrun(w, st)
            length, code = _AC_CODES_PROG[0xF0]
            w.write(code, length)
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:  # already nonzero at the previous precision: correction bit
            br.append(t & 1)
            continue
        _emit_eobrun(w, st)
        length, code = _AC_CODES_PROG[(run << 4) | 1]
        w.write(code, length)
        w.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.eob += 1
        st.be.extend(br)
        if st.eob == 0x7FFF or len(st.be) > 937:  # libjpeg MAX_CORR_BITS guard
            _emit_eobrun(w, st)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    grayscale: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Progressive JPEG (SOF2) from row-major RGB bytes, unit quantisation
    tables, fixed scan script exercising every progressive decode path:

      1. DC first scan, Al=1 (interleaved for color)
      2. AC first scans per component, spectral bands 1-5 then 6-63, Al=1
      3. DC refinement scan, Ah=1 -> Al=0
      4. AC refinement scans per component, same bands, Ah=1 -> Al=0

    Successive approximation sends coefficients at half precision first
    and restores the low bit in the refinement scans, so the round trip
    is exactly as lossy as the baseline encoder (transform-only):
    block-constant images round-trip EXACTLY."""
    planes, samp, mcus_x, mcus_y = _prep_planes(
        width, height, pixels, grayscale, subsampling
    )
    ncomp = len(planes)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    # full-precision quantised coefficients, zigzag order, per component
    coefs = []
    for plane, (h, v) in zip(planes, samp):
        by, bx = mcus_y * v, mcus_x * h
        blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        cf = np.round(np.einsum("ux,abxy,vy->abuv", _A, blocks - 128.0, _A))
        coefs.append(cf[..., _ZZR, _ZZC].astype(np.int64))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT 0: unit table
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALUES)
    out += _seg(
        0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS_PROG) + _ENC_AC_VALUES_PROG
    )

    def sos_header(members: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        sos = bytes([len(members)])
        for ci in members:
            sos += bytes([ci + 1, 0x00])  # Td=0, Ta=0 (the one table of each class)
        return sos + bytes([ss, se, (ah << 4) | al])

    def comp_grid(ci: int) -> tuple[int, int]:
        h, v = samp[ci]
        return (
            (-(-height * v // vmax) + 7) // 8,
            (-(-width * h // hmax) + 7) // 8,
        )

    def dc_scan(ah: int, al: int) -> bytes:
        w = _BitWriter()
        if ncomp == 1:
            bh, bw = comp_grid(0)
            order = [(0, by, bx) for by in range(bh) for bx in range(bw)]
        else:
            order = []
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci, (h, v) in enumerate(samp):
                    for by in range(v):
                        for bx in range(h):
                            order.append((ci, my * v + by, mx * h + bx))
        preds = [0] * ncomp
        for ci, by, bx in order:
            dc = int(coefs[ci][by, bx, 0])
            if ah == 0:
                t = dc >> al
                diff = t - preds[ci]
                preds[ci] = t
                size = _category(diff)
                length, code = _DC_CODES[size]
                w.write(code, length)
                if size:
                    w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            else:
                w.write((dc >> al) & 1, 1)
        w.flush()
        return bytes(w.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        st = _ProgState()
        bh, bw = comp_grid(ci)
        for by in range(bh):
            for bx in range(bw):
                zz = coefs[ci][by, bx]
                if ah == 0:
                    _enc_ac_first_block(w, st, zz, ss, se, al)
                else:
                    _enc_ac_refine_block(w, st, zz, ss, se, al)
        _emit_eobrun(w, st)
        w.flush()
        return bytes(w.out)

    bands = [(1, 5), (6, 63)]
    # scan script (see docstring)
    out += _seg(0xDA, sos_header(list(range(ncomp)), 0, 0, 0, 1))
    out += dc_scan(0, 1)
    for ci in range(ncomp):
        for lo, hi in bands:
            out += _seg(0xDA, sos_header([ci], lo, hi, 0, 1))
            out += ac_scan(ci, lo, hi, 0, 1)
    out += _seg(0xDA, sos_header(list(range(ncomp)), 0, 0, 1, 0))
    out += dc_scan(1, 0)
    for ci in range(ncomp):
        for lo, hi in bands:
            out += _seg(0xDA, sos_header([ci], lo, hi, 1, 0))
            out += ac_scan(ci, lo, hi, 1, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
