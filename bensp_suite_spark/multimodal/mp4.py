"""Pure-Python ISO BMFF (MP4) muxer/demuxer carrying Motion-JPEG samples.

Closes the compressed-video container stub the way JPEG (round 4) and FLAC
(round 5) closed the image/audio ones: the container layer — box structure,
sample tables, chunk offsets — is the public ISO/IEC 14496-12 spec and is
fully implemented here; the per-frame payload is baseline JPEG decoded by
the repo's own bit-deterministic codec (``multimodal/jpeg.py``), so the
whole compressed-video ingest path runs end-to-end in this container with
no native media libraries. H.264/HEVC/AAC sample entries remain
environment-gated (PyAV/ffmpeg territory, same contract as before): the
demuxer raises a typed NotImplementedError naming the codec it found.

Reference ingest parity: the reference's h3 input class feeds compressed
video TARs through its decoder stage (bin/parsec_stream:30-39,
tools/Inputs_review.txt); this module is the Spark-side equivalent of that
demux+decode front end.

Writer layouts: flat ``ftyp | mdat | moov`` (one video track, one chunk,
constant sample duration) and fragmented ``ftyp | moov(mvex) | [moof mdat]…``
(``encode_mp4_mjpeg_fragmented`` — the DASH/HLS/live-recording shape). The
PARSER implements the general stsc expansion (any chunking) AND the movie-
fragment walk (tfhd base offsets, trun sample runs), so third-party MJPEG
files in either layout demux correctly; both writers' outputs demux to
identical samples for identical frames.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_MJPEG_QUALITY = 90


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 25) -> bytes:
    """(N, H, W, 3) uint8 RGB → MP4 bytes with one 'jpeg' video track.

    Every frame is encoded with the pure JPEG codec at fixed settings, so
    identical input frames produce byte-identical samples — the property
    the dedup goldens lean on."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (N, H, W, 3) uint8 RGB")
    n, h, w, _ = frames.shape
    samples = [
        encode_jpeg(frames[i], quality=_MJPEG_QUALITY, subsample=True)
        for i in range(n)
    ]
    sizes = [len(s) for s in samples]
    mdat_body = b"".join(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)  # ctime, mtime, timescale, duration
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, n)  # ctime, mtime, track_id, rsvd, duration
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)  # layer, alt_group, volume, rsvd
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))

    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def encode_mp4_mjpeg_fragmented(
    frames: np.ndarray, fps: int = 25, samples_per_fragment: int = 1
) -> bytes:
    """(N, H, W, 3) uint8 RGB → FRAGMENTED MP4 (fMP4/CMAF layout:
    ``ftyp | moov(mvex) | [moof mdat]…``) with one 'jpeg' video track.

    This is the commonest real-world mp4 variant (DASH/HLS segments,
    live recordings): the moov carries EMPTY sample tables plus an mvex
    declaring movie fragments, and every moof/mdat pair carries its own
    sample run. Exists so the demuxer's fragment walk is exercised by a
    writer in the same repo — flat and fragmented muxes of the same
    frames must demux to identical samples."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (N, H, W, 3) uint8 RGB")
    n, h, w, _ = frames.shape
    samples = [
        encode_jpeg(frames[i], quality=_MJPEG_QUALITY, subsample=True)
        for i in range(n)
    ]

    # moov with empty sample tables + mvex/trex (defaults: duration 1,
    # size 0 — every trun carries explicit sizes)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, 0)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, 0, 0x55C4, 0))
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0)),
    )
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", vmhd + dinf + stbl)))
    # trex: track 1, default sample_description 1, duration 1, size 0, flags 0
    mvex = _box(b"mvex", _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, 0, 0)))
    moov = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41" + b"iso5")

    out = [ftyp, moov]
    seq = 0
    for i in range(0, n, samples_per_fragment):
        run = samples[i : i + samples_per_fragment]
        seq += 1
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x020000) — offsets are moof-relative
        tfhd = _full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
        # trun: data-offset-present | sample-size-present; data_offset is
        # moof-relative and depends on moof's own length → build once with
        # a placeholder, then rebuild with the measured offset (the length
        # is offset-independent)
        def _trun(off: int) -> bytes:
            return _full(
                b"trun", 0, 0x000001 | 0x000200,
                struct.pack(">Ii", len(run), off)
                + b"".join(struct.pack(">I", len(s)) for s in run),
            )

        moof_len = len(_box(b"moof", mfhd + _box(b"traf", tfhd + _trun(0))))
        moof = _box(
            b"moof", mfhd + _box(b"traf", tfhd + _trun(moof_len + 8))
        )
        out.append(moof)
        out.append(_box(b"mdat", b"".join(run)))
    return b"".join(out)


def _boxes(buf: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed mp4: box {tag!r} size {size} at {pos}")
        yield tag, body, pos + size
        pos += size


def _find(buf: bytes, pos: int, end: int, path: list[bytes]) -> tuple[int, int]:
    """→ (body_start, body_end) of the first box at the given nesting path."""
    head, rest = path[0], path[1:]
    for tag, b0, b1 in _boxes(buf, pos, end):
        if tag == head:
            return (b0, b1) if not rest else _find(buf, b0, b1, rest)
    raise ValueError(f"malformed mp4: missing box {b'/'.join(path).decode()!r}")


def demux_mp4(payload: bytes) -> tuple[bytes, list[bytes]]:
    """MP4 bytes → (sample_entry_fourcc, [sample bytes]) for the first
    video track. Implements the general stsc chunk expansion, so any
    legal chunking (not just this writer's single-chunk layout) demuxes.
    Any malformed input raises ValueError (fuzz-tested: arbitrary bytes
    and bit-flipped valid files never escape as raw struct/index
    errors)."""
    try:
        return _demux_mp4(payload)
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed mp4: {e}") from e


def _demux_mp4(payload: bytes) -> tuple[bytes, list[bytes]]:
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an mp4: missing ftyp header")
    moov = None
    moofs: list[tuple[int, int]] = []
    for tag, b0, b1 in _boxes(payload, 0, len(payload)):
        if tag == b"moov":
            moov = (b0, b1)
        elif tag == b"moof":
            moofs.append((b0, b1))
    if moov is None:
        raise ValueError("malformed mp4: no moov box")

    stbl = None
    track_id = None
    for tag, t0, t1 in _boxes(payload, *moov):
        if tag != b"trak":
            continue
        h0, h1 = _find(payload, t0, t1, [b"mdia", b"hdlr"])
        if payload[h0 + 8 : h0 + 12] != b"vide":
            continue
        stbl = _find(payload, t0, t1, [b"mdia", b"minf", b"stbl"])
        k0, _k1 = _find(payload, t0, t1, [b"tkhd"])
        tk_version = payload[k0]
        # tkhd track_ID: after version/flags(4) + ctime/mtime (4+4 at v0,
        # 8+8 at v1)
        track_id = struct.unpack_from(
            ">I", payload, k0 + (20 if tk_version == 1 else 12)
        )[0]
        break
    if stbl is None:
        raise ValueError("malformed mp4: no video track")

    # mvex/trex defaults (ISO 14496-12 §8.8.3): the LAST fallback in the
    # fragment sample-size chain trun size → tfhd default → trex default —
    # a third-party fMP4 may legitimately carry sizes only here
    trex_default_size = 0
    for tag, x0, x1 in _boxes(payload, *moov):
        if tag != b"mvex":
            continue
        for xtag, e0, _e1 in _boxes(payload, x0, x1):
            if xtag == b"trex":
                tr_track, _sdi, _dur, dsize = struct.unpack_from(
                    ">IIII", payload, e0 + 4
                )
                if tr_track == track_id:
                    trex_default_size = dsize

    def full_body(tag: bytes) -> bytes:
        b0, b1 = _find(payload, *stbl, [tag])
        return payload[b0 + 4 : b1]  # skip version/flags

    stsd = full_body(b"stsd")
    fourcc = stsd[8:12]  # first sample entry's format

    sz = full_body(b"stsz")
    fixed, count = struct.unpack_from(">II", sz, 0)
    sizes = (
        [fixed] * count
        if fixed
        else list(struct.unpack_from(f">{count}I", sz, 8))
    )

    try:
        co = full_body(b"stco")
        (n_chunks,) = struct.unpack_from(">I", co, 0)
        offsets = list(struct.unpack_from(f">{n_chunks}I", co, 4))
    except ValueError:
        co = full_body(b"co64")
        (n_chunks,) = struct.unpack_from(">I", co, 0)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", co, 4))

    sc = full_body(b"stsc")
    (n_ent,) = struct.unpack_from(">I", sc, 0)
    ents = [struct.unpack_from(">III", sc, 4 + 12 * i) for i in range(n_ent)]

    # stsc expansion: entry i applies from its first_chunk until the next
    # entry's first_chunk (1-based chunk numbering)
    samples: list[bytes] = []
    si = 0
    for i, (first, per_chunk, _sdi) in enumerate(ents):
        last = ents[i + 1][0] - 1 if i + 1 < n_ent else n_chunks
        if first < 1 or last > n_chunks:
            raise ValueError("malformed mp4: stsc references missing chunks")
        for chunk in range(first, last + 1):
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= count:
                    break
                end = pos + sizes[si]
                if end > len(payload):
                    raise ValueError(
                        "malformed mp4: sample extends past end of file"
                    )
                samples.append(payload[pos:end])
                pos = end
                si += 1
    if si != count:
        raise ValueError(
            f"malformed mp4: sample tables disagree (stsz {count}, stsc walk {si})"
        )

    # Movie fragments (fMP4 — the DASH/HLS/live-recording layout): each
    # top-level moof carries tfhd (track + defaults) and trun (sample run)
    # boxes; sample data lives in the following mdat at moof-relative or
    # explicit base offsets. The walk appends fragment samples after any
    # moov-resident ones (normally none — fragmented files ship empty
    # sample tables).
    for moof_b0, moof_b1 in moofs:
        # _boxes yields BODY offsets; recover the box (header) start —
        # 8-byte standard header or 16-byte largesize header
        if payload[moof_b0 - 4 : moof_b0] == b"moof":
            moof_start = moof_b0 - 8
        elif payload[moof_b0 - 12 : moof_b0 - 8] == b"moof":
            moof_start = moof_b0 - 16
        else:  # unreachable for inputs produced by _boxes, but stay typed
            raise ValueError("malformed mp4: cannot locate moof header")
        for ftag, f0, f1 in _boxes(payload, moof_b0, moof_b1):
            if ftag != b"traf":
                continue
            base = None
            default_size = None
            cursor = None
            for ttag, u0, u1 in _boxes(payload, f0, f1):
                if ttag == b"tfhd":
                    tf_flags = int.from_bytes(payload[u0 + 1 : u0 + 4], "big")
                    tf_track = struct.unpack_from(">I", payload, u0 + 4)[0]
                    if tf_track != track_id:
                        base = "skip"
                        break
                    p = u0 + 8
                    if tf_flags & 0x000001:  # base-data-offset-present
                        base = struct.unpack_from(">Q", payload, p)[0]
                        p += 8
                    else:
                        # default-base-is-moof, and the common first-traf
                        # convention, both anchor at the moof box start
                        base = moof_start
                    if tf_flags & 0x000002:
                        p += 4  # sample-description-index
                    if tf_flags & 0x000008:
                        p += 4  # default-sample-duration
                    if tf_flags & 0x000010:
                        default_size = struct.unpack_from(">I", payload, p)[0]
                elif ttag == b"trun":
                    if base == "skip":
                        break
                    if base is None:
                        raise ValueError("malformed mp4: trun before tfhd")
                    tr_flags = int.from_bytes(payload[u0 + 1 : u0 + 4], "big")
                    (n_samp,) = struct.unpack_from(">I", payload, u0 + 4)
                    p = u0 + 8
                    if tr_flags & 0x000001:  # data-offset-present
                        (doff,) = struct.unpack_from(">i", payload, p)
                        p += 4
                        cursor = base + doff
                    elif cursor is None:
                        raise ValueError(
                            "malformed mp4: first trun lacks a data offset"
                        )
                    if tr_flags & 0x000004:
                        p += 4  # first-sample-flags
                    per = (
                        (4 if tr_flags & 0x000100 else 0)  # duration
                        + (4 if tr_flags & 0x000200 else 0)  # size
                        + (4 if tr_flags & 0x000400 else 0)  # flags
                        + (4 if tr_flags & 0x000800 else 0)  # cts offset
                    )
                    for s_i in range(n_samp):
                        sp = p + s_i * per + (4 if tr_flags & 0x000100 else 0)
                        if tr_flags & 0x000200:
                            (s_size,) = struct.unpack_from(">I", payload, sp)
                        elif default_size:
                            s_size = default_size
                        elif trex_default_size:
                            s_size = trex_default_size
                        else:
                            raise ValueError(
                                "malformed mp4: fragment sample has no size "
                                "(no trun size, no tfhd/trex default)"
                            )
                        s_end = cursor + s_size
                        if s_end > len(payload):
                            raise ValueError(
                                "malformed mp4: fragment sample extends past "
                                "end of file"
                            )
                        samples.append(payload[cursor:s_end])
                        cursor = s_end
    return fourcc, samples


def decode_mp4_mjpeg(payload: bytes) -> np.ndarray:
    """MP4 bytes → (N, H, W, 3) uint8 RGB frames via the pure JPEG codec.
    Non-JPEG sample entries (avc1/hev1/…) raise the typed environment
    gate — same contract as the mp3 path."""
    fourcc, samples = demux_mp4(payload)
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"STUB: mp4 sample entry {fourcc.decode(errors='replace')!r} "
            "requires ffmpeg (PyAV); the pure path decodes 'jpeg' (MJPEG) "
            "sample entries"
        )
    frames = []
    for i, s in enumerate(samples):
        try:
            frames.append(decode_jpeg(s))
        except Exception as e:  # decode boundary on untrusted bytes:
            # any codec-internal failure IS "malformed sample", typed
            raise ValueError(f"malformed mp4: jpeg sample {i}: {e}") from e
    if frames and any(f.shape != frames[0].shape for f in frames):
        raise ValueError("malformed mp4: samples decode to differing shapes")
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
