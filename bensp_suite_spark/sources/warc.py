"""WARC ingestion — the container format real crawl corpora arrive in.

The crawl front end (HTML → text, link graph, URL dedup, domain cap,
curation — ``pipelines/web.py``) consumes (url, html) pages; Common
Crawl and every production crawler deliver those pages as WARC files
(ISO 28500: a flat sequence of length-prefixed records, each a version
line + MIME-style headers + a Content-Length body). This source is the
same member-iteration shape as the TAR/ZIP readers beside it
(``binaryfiles.read_tar_members`` — the reference's own archive-ingest
surface, apps/dedup/src/new_dedup.c:925-1107, reads TAR containers the
same way): one ``binaryFile`` row per archive, a ``mapInPandas`` stage
expands records, archives parallelize ACROSS executors while records
stream WITHIN one.

Scale note (100 TB): crawl WARCs are conventionally ~1 GB segments
(Common Crawl's layout), thousands to millions of them — exactly the
parallel-across/serial-within split this plan shape wants. Per-record
gzip members (``.warc.gz``) decompress inside the expand stage with no
extra pass; the whole-file in-memory bound is the same MAXBUF-style
bound the TAR reader documents.

Pure-Python parser — the spec is public and small; no external WARC
library (not in this container, and not needed).
"""

from __future__ import annotations

import gzip as _gzip
import io as _io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed WARC-Date for deterministic fixture/test archives
_FIXED_DATE = "2026-01-01T00:00:00Z"

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def iter_warc_records(data: bytes, path: str = "<bytes>"):
    """Yield ``(record_idx, headers: dict[str, str], block: bytes)`` for
    every record in one (already-decompressed) WARC byte stream.
    ``record_idx`` counts ALL records in file order (warcinfo/request/
    metadata included) — the stable within-file position a reader can
    key on. Header names are lower-cased; values are stripped. Malformed
    framing raises a typed ValueError naming the file."""
    pos, idx, n = 0, 0, len(data)
    while pos < n:
        while data.startswith(_CRLF, pos):  # inter-record separators
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"truncated WARC version line in {path} @ {pos}")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line {version[:20]!r} in {path} @ {pos}"
            )
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block in {path} @ {pos}")
        headers: dict[str, str] = {}
        for line in data[eol + 2 : hdr_end].split(_CRLF):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing/bad Content-Length in {path} @ {pos}") from e
        block_start = hdr_end + len(_HDR_END)
        if block_start + length > n:
            raise ValueError(
                f"record body exceeds file in {path} @ {pos} "
                f"(declared {length}, {n - block_start} available)"
            )
        yield idx, headers, data[block_start : block_start + length]
        idx += 1
        pos = block_start + length


def parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a response record's block (an HTTP/1.x message) into
    ``(status, content_type, payload)``. Returns (None, None, block)
    when the block isn't an HTTP message (resource records etc.)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    hdr_end = block.find(_HDR_END)
    if hdr_end < 0:
        return None, None, block
    lines = block[:hdr_end].split(_CRLF)
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep and k.decode("ascii", "replace").strip().lower() == "content-type":
            ctype = v.decode("utf-8", "replace").strip()
            break
    return status, ctype, block[hdr_end + len(_HDR_END) :]


def read_warc_records(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """→ one row per WARC record across every ``*.warc`` / ``*.warc.gz``
    under ``path``: (warc_path, warc_name, record_idx, record_type, url,
    http_status, content_type, payload). For response records the HTTP
    envelope is parsed off (status + Content-Type surfaced, payload =
    body bytes); other record types carry their raw block as payload.
    ``record_idx`` is the within-file record position over ALL records —
    with (warc_name, record_idx) a row addresses its record exactly.

    ``streaming=True`` reads the same directory as a file STREAM (new
    segments landing → new micro-batches) — the live-crawl shape: a
    fetcher drops finished ``.warc.gz`` segments, the stream expands
    records per trigger, and every downstream page operator is stateless
    scan work, so batch and stream extract identical rows from identical
    segments (a whole file is always one trigger's row — record
    iteration never spans batches)."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    reader = spark.readStream if streaming else spark.read
    reader = reader.format("binaryFile").option("pathGlobFilter", glob)
    if streaming:
        # streaming sources need the (fixed) binaryFile schema up front
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
    files = reader.load(path)

    schema = StructType(
        [
            StructField("warc_path", StringType()),
            StructField("warc_name", StringType()),
            StructField("record_idx", LongType()),
            StructField("record_type", StringType()),
            StructField("url", StringType()),
            StructField("http_status", IntegerType()),
            StructField("content_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                if fpath.endswith(".gz"):
                    # .warc.gz = concatenated per-record gzip members;
                    # GzipFile reads multi-member streams transparently
                    with _gzip.GzipFile(fileobj=_io.BytesIO(raw)) as gz:
                        raw = gz.read()
                name = fpath.rsplit("/", 1)[-1]
                for idx, headers, block in iter_warc_records(raw, fpath):
                    rtype = headers.get("warc-type", "")
                    url = headers.get("warc-target-uri")
                    if rtype == "response":
                        status, ctype, payload = parse_http_response(block)
                    else:
                        status, ctype, payload = None, None, block
                    rows["warc_path"].append(fpath)
                    rows["warc_name"].append(name)
                    rows["record_idx"].append(idx)
                    rows["record_type"].append(rtype)
                    rows["url"].append(url)
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(expand, schema)


def read_warc_pages(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The crawl-pipeline feed: 2xx ``text/html`` response records as
    (warc_name, record_idx, url, html) rows — plug ``url``/``html``
    straight into ``pipelines.web.curate_web_corpus`` or
    ``operators.urls.extract_links``. HTML decodes as UTF-8 with
    replacement (crawl reality: declared charsets lie; the text-analysis
    operators normalize downstream). ``streaming=True`` → the same rows
    from a file stream (see :func:`read_warc_records`)."""
    recs = read_warc_records(spark, path, glob, streaming, max_files_per_trigger)
    return (
        recs.filter(
            (F.col("record_type") == "response")
            & (F.col("http_status") >= 200)
            & (F.col("http_status") < 300)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            "warc_name",
            "record_idx",
            "url",
            F.decode(F.col("payload"), "UTF-8").alias("html"),
        )
    )


def build_warc_bytes(
    records: list[tuple[str, str | None, bytes]], gzip_records: bool = False
) -> bytes:
    """Serialize ``(record_type, target_uri, block)`` triples into WARC
    bytes (``gzip_records=True`` → one gzip member per record, the
    ``.warc.gz`` convention). Deterministic (fixed date, positional
    record ids) — the fixture/test writer; response blocks should be
    full HTTP messages (``build_http_response`` composes one)."""
    out = []
    for i, (rtype, uri, block) in enumerate(records):
        hdr = [
            b"WARC/1.0",
            b"WARC-Type: " + rtype.encode("ascii"),
            f"WARC-Record-ID: <urn:bensp:record-{i}>".encode("ascii"),
            b"WARC-Date: " + _FIXED_DATE.encode("ascii"),
        ]
        if uri is not None:
            hdr.append(b"WARC-Target-URI: " + uri.encode("utf-8"))
        if rtype == "response":
            hdr.append(b"Content-Type: application/http; msgtype=response")
        hdr.append(b"Content-Length: " + str(len(block)).encode("ascii"))
        rec = _CRLF.join(hdr) + _HDR_END + block + _CRLF + _CRLF
        out.append(
            _gzip.compress(rec, compresslevel=1, mtime=0) if gzip_records else rec
        )
    return b"".join(out)


def build_http_response(
    payload: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """Compose the HTTP message block of a WARC response record."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status"
    )
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
