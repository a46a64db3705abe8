"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81, JFIF).

Closes the last gap in the S4 image-ingest surface (SURVEY §2): the
reference ingests compressed images through libjpeg
(``apps/ferret/src/image/image.c:314-358``); this module makes the same
format exercisable end-to-end in a container with no codec libraries.

Scope — the shapes crawl imagery actually uses:

- baseline sequential DCT (SOF0), 8-bit samples
- 1 (grayscale) or 3 (YCbCr) components
- 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling (any h,v in {1,2})
- standard + custom Huffman/quant tables, restart intervals (DRI/RSTn)

The decoder is bit-deterministic: float64 matrix IDCT + round-half-away
is IEEE-exact on every platform, unlike libjpeg whose integer IDCT
variants differ across builds — which is why ``decode_image`` routes
``fmt="jpeg"`` through this decoder even when Pillow is importable (the
declared-query goldens must not depend on which libjpeg a cluster
ships). Production deployments that prefer C-speed decode over bit
reproducibility can store ``fmt="jpeg-libjpeg"``.

Everything here is public-spec arithmetic: quant/Huffman tables are ITU
T.81 Annex K, quality scaling is the IJG curve, color transform is the
JFIF BT.601 full-range matrix.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — standard tables, T.81 K.3
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_mat() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        c = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        m[k] = c * np.cos((2 * np.arange(n) + 1) * k * np.pi / (2 * n))
    return m


_D = _dct_mat()          # forward: D @ block @ D.T
_DT = _D.T               # inverse: D.T @ coef @ D


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality curve: 1..100 → scaled Annex K tables, clamped [1,255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _huff_codes(bits, values):
    """(length, code) per symbol, canonical order (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_table(bits, values):
    """{(length, code): symbol} for the reader."""
    return {(ln, code): sym for sym, (ln, code) in _huff_codes(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill padding


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, surfaces RSTn,
    stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past end
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:   # RSTn — handled by caller
                    self.marker = nxt
                    continue
                else:                        # real marker: end of scan
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        ln, code = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Consume the next RSTn and resync to a byte boundary. The
        marker may not have been latched yet (leftover pad bits can keep
        the reader from refilling), so scan forward for it; only pad
        bytes and a possible FF00 stuffing sit between the last entropy
        byte and the marker."""
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (
            d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7
        ):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("JPEG bitstream: expected restart marker")
        self.pos = p + 2
        self.acc = 0
        self.nbits = 0
        self.marker = None


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) for DPCM/AC value encoding (T.81 F.1.2.1)."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to multiples of (bh, bw) — the standard MCU pad."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H/8, W/8, 8, 8) view-order block split."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 85,
    subsample: bool | str = True,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) → baseline JFIF bytes.

    ``subsample``: ``True``/``"420"`` emits 4:2:0 (the dominant crawl
    shape), ``"422"`` emits 4:2:2, ``False``/``"444"`` emits 4:4:4.
    Standard Annex K Huffman tables, one interleaved scan;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real crawl JPEGs carry, and the
    decoder path that needs test coverage)."""
    gray = rgb.ndim == 2
    if gray:
        planes = [rgb.astype(np.float64)]
        samps = [(1, 1)]
    else:
        # subsample: True/"420" → 4:2:0, "422" → 4:2:2, False/"444" → 4:4:4
        mode = {True: "420", False: "444"}.get(subsample, subsample)
        ycc = _rgb_to_ycbcr(rgb)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if mode == "420":
            fh, fw = 2, 2
            samps = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            fh, fw = 1, 2
            samps = [(2, 1), (1, 1), (1, 1)]
        elif mode == "444":
            fh, fw = 1, 1
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsampling mode {subsample!r}")
        if fh * fw > 1:
            cbp = _pad_to_block(cb, fh, fw)
            crp = _pad_to_block(cr, fh, fw)
            cb = (cbp.reshape(cbp.shape[0] // fh, fh, cbp.shape[1] // fw, fw)
                  .mean(axis=(1, 3)))
            cr = (crp.reshape(crp.shape[0] // fh, fh, crp.shape[1] // fw, fw)
                  .mean(axis=(1, 3)))
        planes = [y, cb, cr]

    h, w = rgb.shape[:2]
    qlum, qchrom = _quality_tables(quality)
    qtabs = [qlum.reshape(8, 8), qchrom.reshape(8, 8)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized coefficient blocks per component, padded (edge-replicate)
    # to the full MCU grid: (mcus_y·8·sv) × (mcus_x·8·sh)
    comp_blocks = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samps)):
        q = qtabs[0 if ci == 0 else 1].astype(np.float64)
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        padded = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blk = _blocks(padded) - 128.0
        coef = np.einsum("ij,xyjk,lk->xyil", _D, blk, _D)
        qcoef = np.round(coef / q).astype(np.int64)
        comp_blocks.append(qcoef)

    dc_tables = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHROM)]
    ac_tables = [_huff_codes(*_AC_LUM), _huff_codes(*_AC_CHROM)]

    bw_ = _BitWriter()
    pred = [0] * len(planes)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]
                )
                pred = [0] * len(planes)
            mcu_i += 1
            for ci, (sh, sv) in enumerate(samps):
                dc_t = dc_tables[0 if ci == 0 else 1]
                ac_t = ac_tables[0 if ci == 0 else 1]
                for by in range(sv):
                    for bx in range(sh):
                        blk = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s, code = _magnitude(int(diff))
                        ln, c = dc_t[s]
                        bw_.put(c, ln)
                        if s:
                            bw_.put(code, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, c = ac_t[0xF0]   # ZRL
                                bw_.put(c, ln)
                                run -= 16
                            s, code = _magnitude(v)
                            ln, c = ac_t[(run << 4) | s]
                            bw_.put(c, ln)
                            bw_.put(code, s)
                            run = 0
                        if run:
                            ln, c = ac_t[0x00]       # EOB
                            bw_.put(c, ln)
    bw_.flush()

    # --- assemble the JFIF stream ---
    out = bytearray(b"\xFF\xD8")                      # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"      # APP0
    for tid, q in enumerate(qtabs[: 1 if gray else 2]):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in q.reshape(64)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samps[ci]
        out += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    huffs = [(_DC_LUM, 0x00), (_AC_LUM, 0x10)]
    if not gray:
        huffs += [(_DC_CHROM, 0x01), (_AC_CHROM, 0x11)]
    for (bits, values), tc in huffs:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), tc) \
            + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3F\x00"                            # Ss, Se, Ah/Al
    out += bw_.out
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB ((H, W) stays 3-channel
    by gray replication, matching decode_image's contract). Malformed
    bytes raise typed ValueError (hostile-input contract, fuzz-tested)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError, OverflowError, MemoryError,
            ZeroDivisionError, StopIteration) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    d = payload
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    while pos < len(d):
        if d[pos] != 0xFF or pos + 1 >= len(d):
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = d[pos + 1]
        if marker == 0xFF:           # optional fill bytes before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:                       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                             # parameterless
        (seglen,) = struct.unpack_from(">H", d, pos)
        body = d[pos + 2 : pos + seglen]
        if marker == 0xDB:                       # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                bpos += 1
                if pq:                           # 16-bit table
                    vals = np.frombuffer(body, ">u2", 64, bpos).astype(np.int64)
                    bpos += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, bpos).astype(np.int64)
                    bpos += 64
                qtabs[tq] = vals[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:                     # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _huff_decode_table(bits, values)
                bpos += 17 + n
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = struct.unpack_from("BB", body, 1 + 2 * si)
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, dc_tabs[tt >> 4], ac_tabs[tt & 0x0F]))
            pos += seglen
            return _decode_scan(d, pos, frame, scan, qtabs, restart_interval)
        pos += seglen
    raise ValueError("JPEG: no scan found")


def _decode_scan(d, pos, frame, scan, qtabs, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    store = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in comps
    ]
    rd = _BitReader(d, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rd.restart()
                pred = [0] * len(comps)
            mcu_i += 1
            for ci, (comp, dct, act) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = store[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                        s = rd.huff(dct)
                        diff = _extend(rd.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:      # ZRL
                                    k += 16
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overflow")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1

    planes = []
    for ci, comp in enumerate(comps):
        q = qtabs[comp["tq"]].astype(np.float64)
        coef = store[ci][..., _UNZIGZAG].reshape(
            store[ci].shape[0], store[ci].shape[1], 8, 8
        ).astype(np.float64) * q
        pix = np.einsum("ji,xyjk,kl->xyil", _D, coef, _D) + 128.0
        bh, bw_ = pix.shape[0], pix.shape[1]
        plane = pix.swapaxes(1, 2).reshape(bh * 8, bw_ * 8)
        # nearest-neighbor upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], 0), hmax // comp["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
