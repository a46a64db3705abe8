"""Pure-Python FLAC codec (public-spec arithmetic only: RFC 9639 / the
xiph.org FLAC format specification).

The audio sibling of the round-4 JPEG codec: one REAL compressed audio
format is decodable in this container with zero native dependencies, so
the reference's compressed-audio ingest class (the h3 input set of
`bin/parsec_stream:30-39`, `tools/Inputs_review.txt`) is exercisable
end-to-end. FLAC is lossless, so — unlike JPEG — goldens pinned from raw
samples ride through the codec unchanged, and every round-trip test is a
bit-exact equality.

Decoder scope (the full fixed-blocksize baseline a real encoder emits):
  - STREAMINFO parse, other metadata blocks skipped
  - frame headers: all block-size / sample-rate / sample-size codes
    (table, 8/16-bit end-of-header forms, STREAMINFO fallback), UTF-8
    coded frame numbers, CRC-8 verification
  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    (qlp precision, non-negative shift, signed coefficients), wasted bits
  - residuals: 4-bit RICE and 5-bit RICE2 methods, any partition order,
    escaped (raw binary) partitions
  - stereo decorrelation: independent, left/side, right/side, mid/side
    (side channel at bps+1)
  - integrity: frame CRC-16 and STREAMINFO MD5 checks, typed
    FlacFormatError on malformed input (the AVI-decoder convention)

Encoder scope (enough to build deterministic fixtures and exercise every
decoder path round-trip): mono/stereo, 8/16/24-bit, CONSTANT / VERBATIM /
FIXED(0-4) subframe choice by estimated Rice cost, optional LPC emission
(fixed-predictor coefficients through the LPC wire format), Rice
partitions of any order, RICE2, escapes, wasted-bits detection, and all
four stereo modes. Everything is integer arithmetic → bit-deterministic
across hosts.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacFormatError(ValueError):
    """Malformed / unsupported FLAC bitstream (typed, like the AVI path)."""


# --- CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0) ---

def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TABLE[(r >> 8) ^ b]
    return r


# --- bit-level IO -----------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise FlacFormatError("unexpected end of FLAC stream")
            rem = 8 - bit
            take = rem if rem < n else n
            v = (v << take) | ((data[pos] >> (rem - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                pos += 1
                bit = 0
        self.pos, self.bit = pos, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        count = 0
        data = self.data
        while True:
            if self.pos >= len(data):
                raise FlacFormatError("unexpected end of FLAC stream in unary")
            chunk = data[self.pos] & ((1 << (8 - self.bit)) - 1)
            if chunk == 0:
                count += 8 - self.bit
                self.pos += 1
                self.bit = 0
            else:
                lead = (8 - self.bit) - chunk.bit_length()
                count += lead
                self.bit += lead + 1
                if self.bit == 8:
                    self.pos += 1
                    self.bit = 0
                return count

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


# --- UTF-8-style coded numbers (frame header, up to 36 bits / 7 bytes) ------

def _encode_utf8_number(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            out = [lead | (value >> shift)]
            for i in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((value >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number exceeds 36 bits")


def _decode_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (6 - i)) & 1:
            nbytes = i + 1
            break
    else:
        raise FlacFormatError("invalid UTF-8 coded number in frame header")
    if nbytes < 2:
        raise FlacFormatError("invalid UTF-8 coded number in frame header")
    v = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacFormatError("invalid UTF-8 continuation in frame header")
        v = (v << 6) | (b & 0x3F)
    return v


# --- spec tables ------------------------------------------------------------

_SAMPLE_RATE_CODES = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}
_SAMPLE_RATE_FROM_CODE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}

_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_SAMPLE_SIZE_FROM_CODE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}

_BLOCK_SIZE_CODES = {
    192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011, 4096: 0b1100,
    8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_BLOCK_SIZE_FROM_CODE = {v: k for k, v in _BLOCK_SIZE_CODES.items()}

# fixed predictor coefficients (most-recent sample first), orders 0-4
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


# --- residual (Rice) coding -------------------------------------------------

def _fold(res: np.ndarray) -> np.ndarray:
    """zigzag: r>=0 → 2r, r<0 → -2r-1 (unsigned folding for Rice)."""
    r = res.astype(np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _best_rice_param(z: np.ndarray, max_param: int) -> tuple[int, int]:
    """(param, cost_bits) minimizing n·(k+1) + Σ(z >> k); may return
    max_param+1 meaning 'escape is cheaper'."""
    n = len(z)
    if n == 0:
        return 0, 0
    best_k, best_cost = 0, None
    for k in range(0, max_param + 1):
        cost = n * (k + 1) + int((z >> k).sum())
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    # escape cost: 5-bit size header + n·bits (raw two's complement)
    zmax = int(z.max()) if n else 0
    raw_bits = (zmax.bit_length() + 1) if zmax else 0
    # the escape size header is a 5-bit wire field: raw_bits > 31 (possible
    # only if sample widths beyond 24-bit are ever enabled) must fail loudly
    # here rather than let the masking _BitWriter wrap it to 0 and emit a
    # silently corrupt stream
    if raw_bits > 31:
        raise FlacFormatError(
            f"escaped-partition raw_bits={raw_bits} exceeds the 5-bit wire field"
        )
    if 5 + n * raw_bits < best_cost:
        return max_param + 1, 5 + n * raw_bits
    return best_k, best_cost


def _write_residual(
    w: _BitWriter,
    res: np.ndarray,
    block_size: int,
    order: int,
    partition_order: int,
    rice2: bool,
) -> None:
    max_param = 30 if rice2 else 14
    escape_code = 0b11111 if rice2 else 0b1111
    param_bits = 5 if rice2 else 4
    # clamp for short (tail) blocks: partitions must divide the block size
    # and the first partition must still hold samples after the warmup
    while partition_order > 0 and (
        block_size % (1 << partition_order)
        or (block_size >> partition_order) <= order
    ):
        partition_order -= 1
    w.write(0b01 if rice2 else 0b00, 2)
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    part_len = block_size >> partition_order
    idx = 0
    for p in range(nparts):
        count = part_len - (order if p == 0 else 0)
        part = res[idx : idx + count]
        idx += count
        z = _fold(part)
        k, _ = _best_rice_param(z, max_param)
        if k > max_param:
            zmax = int(z.max()) if len(z) else 0
            raw_bits = (zmax.bit_length() + 1) if zmax else 0
            if raw_bits > 31:  # 5-bit wire field; see _best_rice_param
                raise FlacFormatError(
                    f"escaped-partition raw_bits={raw_bits} exceeds the 5-bit wire field"
                )
            w.write(escape_code, param_bits)
            w.write(raw_bits, 5)
            for v in part:
                w.write_signed(int(v), raw_bits) if raw_bits else None
        else:
            w.write(k, param_bits)
            for zv in z:
                zv = int(zv)
                w.write_unary(zv >> k)
                w.write(zv, k)


def _read_residual(
    r: _BitReader, block_size: int, order: int
) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise FlacFormatError(f"reserved residual coding method {method}")
    param_bits = 5 if method == 1 else 4
    escape_code = (1 << param_bits) - 1
    partition_order = r.read(4)
    nparts = 1 << partition_order
    if block_size % nparts:
        raise FlacFormatError("block size not divisible by partition count")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    part_len = block_size >> partition_order
    for p in range(nparts):
        count = part_len - (order if p == 0 else 0)
        if count < 0:
            raise FlacFormatError("partition smaller than predictor order")
        param = r.read(param_bits)
        if param == escape_code:
            raw_bits = r.read(5)
            if raw_bits == 0:
                out[idx : idx + count] = 0
            else:
                for i in range(count):
                    out[idx + i] = r.read_signed(raw_bits)
            idx += count
            continue
        else:
            for i in range(count):
                q = r.read_unary()
                z = (q << param) | r.read(param)
                out[idx + i] = (z >> 1) ^ -(z & 1)  # unfold zigzag
        idx += count
    return out


# --- subframes --------------------------------------------------------------

def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(
    w: _BitWriter,
    s: np.ndarray,
    bps: int,
    partition_order: int,
    rice2: bool,
    force_lpc: bool,
    detect_wasted: bool,
) -> None:
    s = s.astype(np.int64)
    n = len(s)

    wasted = 0
    if detect_wasted and n and np.any(s):
        ored = int(np.bitwise_or.reduce(s) & ((1 << bps) - 1))
        while wasted < 8 and ored and not (ored >> wasted) & 1:
            wasted += 1
        if wasted:
            s = s >> wasted
    eff_bps = bps - wasted

    def header(type_bits: int) -> None:
        w.write(0, 1)  # mandatory zero pad
        w.write(type_bits, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if n and np.all(s == s[0]):
        header(0b000000)
        w.write_signed(int(s[0]), eff_bps)
        return

    # pick the cheapest fixed order by residual cost
    best_order, best_cost, best_res = 0, None, None
    max_order = min(4, n - 1) if n > 1 else 0
    for order in range(0, max_order + 1):
        res = _fixed_residual(s, order)
        z = _fold(res)
        _, cost = _best_rice_param(z, 30 if rice2 else 14)
        cost += order * eff_bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res

    if best_cost is None or best_cost >= n * eff_bps:
        header(0b000001)  # VERBATIM
        for v in s:
            w.write_signed(int(v), eff_bps)
        return

    if force_lpc and best_order >= 1:
        # express the fixed predictor through the LPC wire format
        # (coefficients from the fixed table, shift 0) — exercises the
        # general LPC decode path with bit-exact round-trip semantics
        coefs = _FIXED_COEFS[best_order]
        precision = max(abs(c) for c in coefs).bit_length() + 1
        header(0b100000 | (best_order - 1))
        for v in s[:best_order]:
            w.write_signed(int(v), eff_bps)
        w.write(precision - 1, 4)
        w.write(0, 5)  # shift = 0
        for c in coefs:
            w.write_signed(c, precision)
        _write_residual(w, best_res, n, best_order, partition_order, rice2)
        return

    header(0b001000 | best_order)
    for v in s[:best_order]:
        w.write_signed(int(v), eff_bps)
    _write_residual(w, best_res, n, best_order, partition_order, rice2)


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise FlacFormatError("subframe header padding bit is not zero")
    type_bits = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise FlacFormatError("wasted bits exceed sample size")

    if type_bits == 0b000000:  # CONSTANT
        v = r.read_signed(eff_bps)
        s = np.full(block_size, v, dtype=np.int64)
    elif type_bits == 0b000001:  # VERBATIM
        s = np.fromiter(
            (r.read_signed(eff_bps) for _ in range(block_size)),
            dtype=np.int64,
            count=block_size,
        )
    elif 0b001000 <= type_bits <= 0b001100:  # FIXED 0-4
        order = type_bits & 0b000111
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        s = np.empty(block_size, dtype=np.int64)
        s[:order] = warm
        if order == 0:
            s[:] = res
        else:
            # reconstruct via the direct recurrence (handles warmup exactly)
            coefs = _FIXED_COEFS[order]
            for i in range(order, block_size):
                p = 0
                for j, c in enumerate(coefs):
                    p += c * int(s[i - 1 - j])
                s[i] = int(res[i - order]) + p
    elif type_bits >= 0b100000:  # LPC
        order = (type_bits & 0b011111) + 1
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacFormatError("invalid LPC precision code 0b1111")
        if r.read(1):
            raise FlacFormatError("negative LPC quantization shift is forbidden")
        shift = r.read(4)
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        s = np.empty(block_size, dtype=np.int64)
        s[:order] = warm
        for i in range(order, block_size):
            p = 0
            for j in range(order):
                p += coefs[j] * int(s[i - 1 - j])
            s[i] = int(res[i - order]) + (p >> shift)
    else:
        raise FlacFormatError(f"reserved subframe type {type_bits:#08b}")

    if wasted:
        s = s << wasted
    return s


# --- stream-level encode ----------------------------------------------------

def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    rice2: bool = False,
    force_lpc: bool = False,
    detect_wasted: bool = True,
) -> bytes:
    """int samples — shape (n,) mono or (n, 2) stereo — → FLAC bytes.

    All-integer and deterministic. stereo_mode ∈ independent / left-side /
    right-side / mid-side (decorrelation modes exist to exercise every
    decoder path round-trip; independent is the fixture default)."""
    if bits_per_sample not in (8, 16, 24):
        raise ValueError("encoder supports 8/16/24-bit samples")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if channels > 2:
        raise ValueError("encoder supports mono/stereo")
    if channels == 1:
        stereo_mode = "independent"
    if block_size % (1 << partition_order):
        raise ValueError("block_size must be divisible by 2^partition_order")

    bps = bits_per_sample
    lim = 1 << (bps - 1)
    if s.min(initial=0) < -lim or s.max(initial=0) >= lim:
        raise ValueError(f"samples out of range for {bps}-bit")

    # MD5 of the unencoded data: channel-interleaved little-endian
    width = bps // 8
    inter = s.astype(f"<i{8}").reshape(-1)
    raw = b"".join(
        int(v).to_bytes(width, "little", signed=True) for v in inter
    ) if width != 2 else s.astype("<i2").tobytes()
    md5 = hashlib.md5(raw).digest()

    frames = []
    frame_no = 0
    pos = 0
    while pos < n or (n == 0 and frame_no == 0):
        blk = s[pos : pos + block_size]
        bs = len(blk)
        if bs == 0:
            break
        fw = _BitWriter()
        fw.write(0b11111111111110, 14)
        fw.write(0, 1)  # reserved
        fw.write(0, 1)  # fixed blocksize strategy
        bs_code = _BLOCK_SIZE_CODES.get(bs)
        tail_bs: bytes = b""
        if bs_code is None:
            if bs - 1 < 256:
                bs_code, tail_bs = 0b0110, bytes([bs - 1])
            else:
                bs_code, tail_bs = 0b0111, struct.pack(">H", bs - 1)
        fw.write(bs_code, 4)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate)
        tail_sr: bytes = b""
        if sr_code is None:
            if sample_rate < 65536:
                sr_code, tail_sr = 0b1101, struct.pack(">H", sample_rate)
            else:
                sr_code = 0b0000  # decoder falls back to STREAMINFO
        fw.write(sr_code, 4)
        ch_assign = {
            "independent": channels - 1,
            "left-side": 0b1000,
            "right-side": 0b1001,
            "mid-side": 0b1010,
        }[stereo_mode]
        fw.write(ch_assign, 4)
        fw.write(_SAMPLE_SIZE_CODES[bps], 3)
        fw.write(0, 1)  # reserved
        fw.align()
        header = bytes(fw.buf) + _encode_utf8_number(frame_no) + tail_bs + tail_sr
        header += bytes([crc8(header)])

        body = _BitWriter()
        if stereo_mode == "independent":
            subs = [(blk[:, c], bps) for c in range(channels)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo_mode == "left-side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right-side":
                subs = [(side, bps + 1), (right, bps)]
            else:  # mid-side
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        for ch_samples, ch_bps in subs:
            _write_subframe(
                body, ch_samples, ch_bps, partition_order, rice2,
                force_lpc, detect_wasted,
            )
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        frames.append(frame)
        frame_no += 1
        pos += bs

    frame_sizes = [len(f) for f in frames] or [0]
    si = _BitWriter()
    si.write(min(block_size, n) if n else block_size, 16)  # min blocksize
    si.write(block_size, 16)
    si.write(min(frame_sizes), 24)
    si.write(max(frame_sizes), 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5
    # metadata block header: last-block flag, type 0 (STREAMINFO), 24-bit len
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + b"".join(frames)


# --- stream-level decode ----------------------------------------------------

def decode_flac(payload: bytes, verify: bool = True):
    """FLAC bytes → (samples int32 array shape (n, channels), sample_rate,
    bits_per_sample). Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5
    (when non-zero); raises FlacFormatError on malformed input."""
    if payload[:4] != b"fLaC":
        raise FlacFormatError("not a FLAC stream: bad fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise FlacFormatError("truncated metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise FlacFormatError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise FlacFormatError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise FlacFormatError("missing or malformed STREAMINFO")

    sr = _BitReader(streaminfo)
    sr.read(16)  # min blocksize
    sr.read(16)  # max blocksize
    sr.read(24)
    sr.read(24)
    si_rate = sr.read(20)
    channels = sr.read(3) + 1
    bps = sr.read(5) + 1
    total = sr.read(36)
    md5_expect = streaminfo[18:34]

    # Never preallocate by the CLAIMED total: a corrupt STREAMINFO can
    # claim up to 2^36 samples and the allocation itself becomes the
    # crash (fuzz-caught: a single bit flip → 128 GiB np.empty →
    # MemoryError escaping untyped). Accumulate decoded frames — memory
    # then tracks what the payload actually holds — and reconcile with
    # the claimed total at the end.
    chunks: list[np.ndarray] = []
    decoded = 0
    r = _BitReader(payload, pos)
    while (total and decoded < total) or (
        not total and r.pos < len(payload)
    ):
        frame_start = r.pos
        if r.read(14) != 0b11111111111110:
            raise FlacFormatError("bad frame sync code")
        if r.read(1):
            raise FlacFormatError("frame header reserved bit set")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_assign = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise FlacFormatError("frame header reserved bit set")
        _decode_utf8_number(r)
        if bs_code == 0:
            raise FlacFormatError("reserved block size code 0")
        elif bs_code == 0b0110:
            block_size = r.read(8) + 1
        elif bs_code == 0b0111:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_FROM_CODE[bs_code]
        if sr_code == 0:
            rate = si_rate
        elif sr_code == 0b1100:
            rate = r.read(8) * 1000
        elif sr_code == 0b1101:
            rate = r.read(16)
        elif sr_code == 0b1110:
            rate = r.read(16) * 10
        elif sr_code == 0b1111:
            raise FlacFormatError("invalid sample rate code")
        else:
            rate = _SAMPLE_RATE_FROM_CODE[sr_code]
        frame_bps = bps if ss_code == 0 else _SAMPLE_SIZE_FROM_CODE.get(ss_code)
        if frame_bps is None:
            raise FlacFormatError(f"reserved sample size code {ss_code}")
        header_bytes = payload[frame_start : r.pos]
        if crc8(header_bytes) != r.read(8):
            raise FlacFormatError("frame header CRC-8 mismatch")

        if ch_assign <= 0b0111:
            nsubs = ch_assign + 1
            if nsubs != channels:
                raise FlacFormatError("frame channel count differs from STREAMINFO")
            subs = [
                _read_subframe(r, block_size, frame_bps) for _ in range(nsubs)
            ]
            frame_samples = np.stack(subs, axis=1)
        elif ch_assign in (0b1000, 0b1001, 0b1010):
            if channels != 2:
                raise FlacFormatError("stereo decorrelation in non-stereo stream")
            if ch_assign == 0b1000:  # left/side
                left = _read_subframe(r, block_size, frame_bps)
                side = _read_subframe(r, block_size, frame_bps + 1)
                right = left - side
            elif ch_assign == 0b1001:  # right/side
                side = _read_subframe(r, block_size, frame_bps + 1)
                right = _read_subframe(r, block_size, frame_bps)
                left = right + side
            else:  # mid/side
                mid = _read_subframe(r, block_size, frame_bps)
                side = _read_subframe(r, block_size, frame_bps + 1)
                mid2 = (mid << 1) | (side & 1)
                left = (mid2 + side) >> 1
                right = (mid2 - side) >> 1
            frame_samples = np.stack([left, right], axis=1)
        else:
            raise FlacFormatError(f"reserved channel assignment {ch_assign}")

        r.align()
        frame_bytes = payload[frame_start : r.pos]
        if crc16(frame_bytes) != r.read(16):
            raise FlacFormatError("frame CRC-16 mismatch")

        chunks.append(frame_samples)
        decoded += block_size
        _ = rate  # per-frame rate is informational; STREAMINFO rules

    samples = np.concatenate(chunks) if chunks else np.zeros((0, channels), np.int64)
    if total:
        if len(samples) < total:
            raise FlacFormatError("stream ended before STREAMINFO total_samples")
        samples = samples[:total]  # final frame may pad past the total
    if verify and md5_expect != b"\x00" * 16:
        width = (bps + 7) // 8
        if bps % 8 == 0:
            if width == 2:
                raw = samples.astype("<i2").tobytes()
            else:
                raw = b"".join(
                    int(v).to_bytes(width, "little", signed=True)
                    for v in samples.reshape(-1)
                )
            if hashlib.md5(raw).digest() != md5_expect:
                raise FlacFormatError("decoded audio MD5 mismatch")
    return samples.astype(np.int32), si_rate, bps
