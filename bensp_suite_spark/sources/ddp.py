"""The ``.ddp`` archive format (S5/S6, SURVEY §2.1) — byte-exact with the
reference's on-disk layout, plus the canonical Parquet table.

Reference layout (little-endian):
  header: int32 CHECKBIT=123456 + u8 compress_type       (util.c:65-74,
          dedupdef.h:13; COMPRESS_GZIP=0 BZIP2=1 NONE=2, dedupdef.h:311-313)
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
TYPE_FINGERPRINT, TYPE_COMPRESS, TYPE_ORIGINAL = 0, 1, 2
SHA1_LEN = 20

_CTYPE = {"gzip": COMPRESS_GZIP, "bzip2": COMPRESS_BZIP2, "none": COMPRESS_NONE}
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


def iter_ddp_records(blob: bytes):
    """Validate the header and yield ``(seq, rtype, sha1_hex, payload)``
    per record, plus the archive compress_type via StopIteration-free
    protocol: first yielded item is ``("__header__", compress_type)``.
    Shared by the driver-side parser and the distributed data source."""
    (checkbit,) = struct.unpack_from("<i", blob, 0)
    if checkbit != CHECKBIT:
        raise ValueError(f"format error: bad CHECKBIT {checkbit}")
    (ctype,) = struct.unpack_from("<B", blob, 4)
    yield ("__header__", _CNAME[ctype])
    pos = 5
    seq = 0
    while pos < len(blob):
        rtype, length = struct.unpack_from("<BQ", blob, pos)
        pos += 9
        payload = blob[pos : pos + length]
        if len(payload) != length:
            raise ValueError("incomplete chunk")
        pos += length
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


def parse_ddp(spark: SparkSession, blob: bytes) -> tuple[str, DataFrame]:
    """.ddp byte stream → (compress_type, DataFrame of sequential records).
    Sequence numbers are re-derived from record order (the stream is the
    order, decoder.c:173-264 relies on exactly that)."""
    it = iter_ddp_records(blob)
    _, ctype_name = next(it)
    rows = list(it)
    return ctype_name, spark.createDataFrame(
        rows, "seq long, rtype int, sha1 string, payload binary"
    )
