"""The ``.ddp`` archive format (S5/S6, SURVEY §2.1) — byte-exact with the
reference's on-disk layout, plus the canonical Parquet table.

Reference layout (little-endian):
  header: int32 CHECKBIT=123456 + u8 compress_type       (util.c:65-74,
          dedupdef.h:13; COMPRESS_GZIP=0 BZIP2=1 NONE=2, dedupdef.h:311-313;
          ZSTD=3 is OUR extension — the reference decoder does not know it,
          so zstd archives are engine-native, not reference-interchange)
  record: u8 type + u64 len + payload                    (encoder.c:396-411)
          TYPE_FINGERPRINT=0 → 20-byte raw SHA1
          TYPE_COMPRESS=1    → compressed chunk bytes
          TYPE_ORIGINAL=2    → raw chunk bytes           (dedupdef.h:257-259)

The Parquet ``ddp`` table (dedup/pipeline.py) is the engine's canonical,
scalable representation; this module is the fidelity bridge: it serializes
an ordered ddp DataFrame to the exact byte stream the reference's
``dedup -u`` would consume, and parses such streams back.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

CHECKBIT = 123456
COMPRESS_GZIP, COMPRESS_BZIP2, COMPRESS_NONE = 0, 1, 2
COMPRESS_ZSTD = 3  # extension code (not in dedupdef.h)
TYPE_FINGERPRINT, TYPE_COMPRESS, TYPE_ORIGINAL = 0, 1, 2
SHA1_LEN = 20

_CTYPE = {
    "gzip": COMPRESS_GZIP,
    "bzip2": COMPRESS_BZIP2,
    "none": COMPRESS_NONE,
    "zstd": COMPRESS_ZSTD,
}
_CNAME = {v: k for k, v in _CTYPE.items()}


def serialize_ddp(ddp: DataFrame, compress_type: str = "gzip") -> bytes:
    """Ordered ddp DataFrame → byte-exact .ddp stream. Driver-side assembly
    (an archive is a single sequential file by definition — the reference's
    Reorder+write stage is serial too, encoder.c:1345-1496)."""
    out = [struct.pack("<i", CHECKBIT), struct.pack("<B", _CTYPE[compress_type])]
    rows = ddp.select("file_id", "l1", "l2", "rtype", "sha1", "payload").orderBy(
        "file_id", "l1", "l2"
    )
    for row in rows.toLocalIterator():
        if row.rtype == TYPE_FINGERPRINT:
            payload = bytes.fromhex(row.sha1)
            assert len(payload) == SHA1_LEN
        else:
            payload = bytes(row.payload)
        out.append(struct.pack("<BQ", row.rtype, len(payload)))
        out.append(payload)
    return b"".join(out)


def iter_ddp_records_from(fh):
    """Incremental archive parser over a binary file object: validate the
    header and yield ``(seq, rtype, sha1_hex, payload)`` per record, plus
    the archive compress_type via StopIteration-free protocol — the first
    yielded item is ``("__header__", compress_type)``.

    Memory is O(one record): each iteration reads a 9-byte record header
    then exactly the payload length (decoder.c:60-98 reads the stream the
    same way), so a multi-GB archive decodes without ever materializing
    the whole blob on an executor. Works on real files, mmaps wrapped in
    BytesIO, or any object with ``read(n)``."""

    def _read_exact(n: int) -> bytes:
        try:
            buf = fh.read(n)
            # loop for short reads (pipes / network file systems)
            while len(buf) < n:
                more = fh.read(n - len(buf))
                if not more:
                    raise ValueError("incomplete chunk")
                buf += more
        except (OverflowError, MemoryError) as e:
            # a corrupted 8-byte length field can demand reads beyond
            # index range — malformed input, not an engine crash
            raise ValueError(f"implausible chunk length {n}") from e
        return buf

    head = _read_exact(5)
    (checkbit,) = struct.unpack_from("<i", head, 0)
    if checkbit != CHECKBIT:
        raise ValueError(f"format error: bad CHECKBIT {checkbit}")
    ctype = head[4]
    if ctype not in _CNAME:
        raise ValueError(f"format error: unknown compress type byte {ctype}")
    yield ("__header__", _CNAME[ctype])
    seq = 0
    while True:
        rec = fh.read(9)
        if not rec:
            return
        if len(rec) < 9:
            rec += _read_exact(9 - len(rec))
        rtype, length = struct.unpack("<BQ", rec)
        payload = _read_exact(length)
        if rtype == TYPE_FINGERPRINT:
            if length != SHA1_LEN:
                raise ValueError("incorrect size of SHA1 sum")
            yield (seq, rtype, payload.hex(), None)
        elif rtype in (TYPE_COMPRESS, TYPE_ORIGINAL):
            if length <= 0:
                raise ValueError("illegal size of data chunk")
            yield (seq, rtype, None, payload)
        else:
            raise ValueError(f"unknown chunk type {rtype}")
        seq += 1


def iter_ddp_records(blob: bytes):
    """In-memory form of :func:`iter_ddp_records_from` — same protocol,
    for callers that already hold the archive bytes."""
    import io

    yield from iter_ddp_records_from(io.BytesIO(blob))


def parse_ddp(spark: SparkSession, blob: bytes) -> tuple[str, DataFrame]:
    """.ddp byte stream → (compress_type, DataFrame of sequential records).
    Sequence numbers are re-derived from record order (the stream is the
    order, decoder.c:173-264 relies on exactly that)."""
    it = iter_ddp_records(blob)
    _, ctype_name = next(it)
    rows = list(it)
    from ..session import local_rows_df as _ldf

    return ctype_name, _ldf(
        spark, rows, "seq long, rtype int, sha1 string, payload binary", 8
    )
