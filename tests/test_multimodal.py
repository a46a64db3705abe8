"""Image kernel tests (K8 SRM, K9 extraction, K13 HSV) on synthetic
raw-rgb images, plus the end-to-end image→search pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from bensp_suite_spark.multimodal import images as IM


def test_rgb_hsv_properties():
    # gray pixels → s=0, h=0, v=level (delta==0 path, image.c:214-222)
    gray = np.full((4, 4, 3), 77, dtype=np.uint8)
    hsv = IM.rgb_to_hsv(gray)
    assert (hsv[..., 0] == 0).all() and (hsv[..., 1] == 0).all() and (hsv[..., 2] == 77).all()
    # pure red → h=0, s=255, v=255 (mx==r branch)
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[..., 0] = 255
    hsv = IM.rgb_to_hsv(red)
    assert (hsv[..., 0] == 0).all() and (hsv[..., 1] == 255).all() and (hsv[..., 2] == 255).all()
    # pure green → hue=2/6 → h = floor(255*2/6) = 85
    green = np.zeros((2, 2, 3), dtype=np.uint8)
    green[..., 1] = 200
    hsv = IM.rgb_to_hsv(green)
    assert (hsv[..., 0] == 85).all() and (hsv[..., 2] == 200).all()
    # black → all zero (mx==0 early return)
    black = np.zeros((2, 2, 3), dtype=np.uint8)
    assert (IM.rgb_to_hsv(black) == 0).all()


def _scalar_rgb2hsv(rgb_px):
    # independent scalar transcription of pixel_rgb2hsv (image.c:198-236)
    r, g, b = int(rgb_px[0]), int(rgb_px[1]), int(rgb_px[2])
    mx, mn = max(r, g, b), min(r, g, b)
    delta = mx - mn
    if mx == 0:
        return (0, 0, 0)
    s = delta * 255 // mx
    if delta == 0:
        return (0, s, mx)
    if mx == r:
        hue = (g - b) / delta
    elif mx == g:
        hue = 2.0 + (b - r) / delta
    else:
        hue = 4.0 + (r - g) / delta
    if hue < 0:
        hue += 6.0
    return (int(255 * hue / 6.0), s, mx)


def test_rgb_hsv_matches_scalar_reference():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(500, 1, 3), dtype=np.uint8)
    got = IM.rgb_to_hsv(px).reshape(-1, 3)
    want = np.array([_scalar_rgb2hsv(p) for p in px.reshape(-1, 3)], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_srm_segments_rectangles():
    # two flat color blocks → exactly 2 regions, mask matches the blocks
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:, 16:] = [200, 40, 40]
    mask, nrgn = IM.srm_segment(img)
    assert nrgn == 2
    assert len(np.unique(mask[:, :16])) == 1
    assert len(np.unique(mask[:, 16:])) == 1
    assert mask[0, 0] != mask[0, 31]


def test_srm_merges_noise_into_one_region():
    rng = np.random.default_rng(0)
    base = np.full((24, 24, 3), 120, dtype=np.uint8)
    noisy = (base.astype(np.int16) + rng.integers(-3, 4, base.shape)).clip(0, 255).astype(np.uint8)
    _mask, nrgn = IM.srm_segment(noisy)
    assert nrgn == 1  # Q=125 merges ±3 noise


def test_extract_features_invariants():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:, 16:] = [200, 40, 40]
    hsv = IM.rgb_to_hsv(img)
    mask, nrgn = IM.srm_segment(img)
    regions = IM.extract_features(hsv, mask, nrgn)
    assert len(regions) == nrgn
    weights = [w for w, _ in regions]
    assert abs(sum(weights) - 1.0) < 1e-6  # √size normalization
    for _w, feats in regions:
        assert len(feats) == IM.IMAGE_DIM
        # stddev/skew of a flat region are 0 (moments 1,2 per channel)
        assert abs(feats[1]) < 1e-6 and abs(feats[2]) < 1e-6
    # mean moment of the right block: V channel = 200/255 * dw[6]=4.0 ...
    # check one concrete value: region covering the black half has V=0
    dark = min(regions, key=lambda r: r[1][6])
    assert abs(dark[1][6]) < 1e-6


def test_image_decode_adapter_and_routing():
    """Format routing: raw-rgb always real, png via Pillow when
    importable (lossless → byte-exact either way), jpeg always through
    the pure bit-deterministic codec, unknown formats rejected."""
    try:
        import io

        from PIL import Image

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")  # lossless → byte-exact
        assert IM.decode_image(buf.getvalue(), "png").tobytes() == img.tobytes()
    # truncated JPEG → clear format error from the pure decoder
    with pytest.raises(ValueError):
        IM.decode_image(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError, match="unknown image format"):
        IM.decode_image(b"", "tiff")


def test_image_pipeline_end_to_end(spark):
    imgs = IM.synthetic_images(spark, n=10, size=32)
    vecsets = IM.images_to_vecsets(imgs)
    rows = vecsets.collect()
    assert len(rows) == 10
    for r in rows:
        assert 1 <= len(r.regions) <= IM.MAXR
        assert abs(sum(x["weight"] for x in r.regions) - 1.0) < 1e-5

    # feed the ferret query path: every image's top-1 match is itself
    from bensp_suite_spark.ferret import pipeline as FP

    found = FP.ferret_topk(vecsets, vecsets, top_k=1, mode="exhaustive").collect()
    assert all(r.name == f"img_{int(r.q_image_id):05d}.raw" for r in found)


def test_audio_pipeline(spark):
    from bensp_suite_spark.multimodal import audio_video as AV

    rows = []
    for i in range(4):
        rng = np.random.default_rng(50 + i)
        t = np.arange(8192)
        tone = (np.sin(2 * np.pi * t * (110 * (i + 1)) / 16000) * 20000).astype(np.int16)
        rows.append((i, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(tone)))
    audio = spark.createDataFrame(rows, AV.AUDIO_TABLE_SCHEMA)
    feats = {r.media_id: r for r in AV.extract_audio_features(audio).collect()}
    assert len(feats) == 4
    for i, r in feats.items():
        assert r.n_samples == 8192 and abs(r.duration_s - 0.512) < 1e-9
        assert len(r.frame_rms) == 8
        # sine RMS ≈ amplitude/√2 (in normalized units)
        assert abs(r.frame_rms[0] - (20000 / 32768) / np.sqrt(2)) < 0.02
    # higher frequency → higher zero-crossing rate
    assert feats[3].frame_zcr[0] > feats[0].frame_zcr[0]


def test_video_frame_sampling(spark):
    from bensp_suite_spark.multimodal import audio_video as AV

    frames = np.zeros((12, 8, 8, 3), dtype=np.uint8)
    for k in range(12):
        frames[k] = k * 20  # frame k has mean color k*20
    video = spark.createDataFrame(
        [(0, "raw-frames", 8, 8, 12, AV.encode_raw_video(frames))], AV.VIDEO_TABLE_SCHEMA
    )
    out = AV.sample_video_frames(video, every_n=5).collect()
    assert sorted(r.frame_idx for r in out) == [0, 5, 10]
    for r in out:
        assert r.mean_rgb == [r.frame_idx * 20.0] * 3
        assert len(bytes(r.frame)) == 8 * 8 * 3


def test_av_codec_adapters_and_routing(spark):
    """Audio/video format routing: PCM/raw-frames always real; compressed
    formats decode via soundfile / PyAV when importable (round-trip
    checked on a lossless format) and stub cleanly when absent; unknown
    formats rejected."""
    from bensp_suite_spark.multimodal import audio_video as AV

    try:
        import io

        import soundfile as sf

        have_sf = True
    except ImportError:
        have_sf = False
    if have_sf:
        samples = (np.sin(np.linspace(0, 20, 2048)) * 0.5)
        buf = io.BytesIO()
        sf.write(buf, samples, 16000, format="WAV", subtype="DOUBLE")
        got = AV.decode_audio(buf.getvalue(), "wav")
        assert np.allclose(got, samples, atol=1e-12)
    else:
        with pytest.raises(NotImplementedError, match="STUB"):
            AV.decode_audio(b"ID3", "mp3")
    try:
        import av  # noqa: F401

        have_av = True
    except ImportError:
        have_av = False
    if not have_av:
        # mp4 now routes to the pure ISO BMFF demuxer: garbage bytes are a
        # typed format error; only non-MJPEG codecs inside a VALID mp4
        # raise the environment gate (covered in the mp4 test battery)
        with pytest.raises(ValueError, match="mp4"):
            AV.decode_video(b"\x00", "mp4")
        with pytest.raises(NotImplementedError, match="STUB"):
            AV.decode_video(b"\x00", "webm")
    with pytest.raises(ValueError, match="unknown audio format"):
        AV.decode_audio(b"", "aiff")


def test_video_dedup_h264_swap_in_lane(spark):
    """Opt-in lane (r10 verdict #10): where PyAV exists, a compressed-
    codec mp4 decodes through decode_video and the frame-dhash dedup
    path pairs a planted copy — continuously proving the avc1 stub's
    swap-in contract on hosts that have ffmpeg. Skipped (not passed
    vacuously) in containers without PyAV; the typed-stub branch is
    covered by the avc1 gate test above."""
    av = pytest.importorskip("av")
    import io

    frames = np.zeros((6, 64, 64, 3), dtype=np.uint8)
    for i in range(6):
        frames[i, :, : 8 * (i + 1)] = (40 * (i + 1)) % 255
    payload = None
    for codec in ("libx264", "h264", "mpeg4"):
        buf = io.BytesIO()
        try:
            with av.open(buf, "w", format="mp4") as out:
                stream = out.add_stream(codec, rate=25)
                stream.width, stream.height = 64, 64
                stream.pix_fmt = "yuv420p"
                for f in frames:
                    for pkt in stream.encode(
                        av.VideoFrame.from_ndarray(f, format="rgb24")
                    ):
                        out.mux(pkt)
                for pkt in stream.encode():
                    out.mux(pkt)
            payload = buf.getvalue()
            break
        except Exception:
            continue
    if payload is None:
        pytest.skip("PyAV present but no mp4-capable encoder")
    decoded = AV.decode_video(payload, "mp4")
    assert decoded.shape[0] == 6 and decoded.shape[1:] == (64, 64, 3)
    video = spark.createDataFrame(
        [(0, "mp4", bytearray(payload)), (1, "mp4", bytearray(payload))],
        "media_id long, format string, video binary",
    )
    from bensp_suite_spark.multimodal.audio_video import video_frame_dhashes

    hashes = video_frame_dhashes(video, every_n=1)
    a = {r["dhash"] for r in hashes.filter("media_id = 0").collect()}
    b = {r["dhash"] for r in hashes.filter("media_id = 1").collect()}
    assert a and a == b  # identical payloads → identical fingerprints


def test_audio_dedup_mp3_swap_in_lane(spark):
    """Opt-in lane (r10 verdict #4): where soundfile can read mp3
    (libsndfile ≥ 1.1), a compressed mp3 decodes through decode_audio
    and fingerprints pair a planted copy — the mp3 stub's swap-in
    contract. Skipped where soundfile or its mp3 codec is absent."""
    sf = pytest.importorskip("soundfile")
    import io

    if "MP3" not in getattr(sf, "available_formats", lambda: {})():
        pytest.skip("libsndfile without mp3 support")
    samples = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)) * 0.5
    buf = io.BytesIO()
    sf.write(buf, samples, 16000, format="MP3")
    payload = buf.getvalue()
    got = AV.decode_audio(payload, "mp3")
    assert got.shape[0] > 8000  # decoded length in the right ballpark
    fp1 = AV.audio_fingerprint_kernel(got)
    fp2 = AV.audio_fingerprint_kernel(AV.decode_audio(payload, "mp3"))
    assert fp1 == fp2  # deterministic decode → identical fingerprint
    with pytest.raises(ValueError, match="unknown video format"):
        AV.decode_video(b"", "mov")


def test_resize_images_shape_and_determinism(spark):
    from bensp_suite_spark.multimodal import images as IM

    imgs = IM.synthetic_images(spark, n=4, size=40)
    small = IM.resize_images(imgs, 16, 12)
    rows = {r.image_id: r for r in small.collect()}
    assert len(rows) == 4
    for iid, r in rows.items():
        assert (r.width, r.height) == (16, 12)
        arr = IM.decode_image(bytes(r.image), "raw-rgb")
        assert arr.shape == (12, 16, 3)
    # kernel semantics: output pixel = nearest (floor) source pixel
    src = {r.image_id: IM.decode_image(bytes(r.image), "raw-rgb") for r in imgs.collect()}
    import numpy as np

    for iid, r in rows.items():
        got = IM.decode_image(bytes(r.image), "raw-rgb")
        expect = IM.resize_kernel(src[iid], 16, 12)
        assert np.array_equal(got, expect)
    # identity resize is a byte round-trip
    same = IM.resize_images(imgs, 40, 40)
    for r in same.collect():
        assert IM.decode_image(bytes(r.image), "raw-rgb").tobytes() == src[r.image_id].tobytes()


def test_dhash_kernel_properties():
    """Brightness-invariant (no saturation), content-sensitive, codec-stable."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, (32, 32, 3)).astype(np.uint8)
    h0 = IM.dhash_kernel(img)
    bright = np.clip(img.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    assert IM.dhash_kernel(bright) == h0
    other = rng.integers(0, 200, (32, 32, 3)).astype(np.uint8)
    pop = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert pop(h0, IM.dhash_kernel(other)) > 10
    # codec round trip
    assert IM.dhash_kernel(IM.decode_image(IM.encode_raw_rgb(img), "raw-rgb")) == h0


def test_image_near_dup_pairs_finds_planted_dups(spark):
    """Banded dHash join: every planted brightness-shifted copy pairs with
    its source at hamming 0; no cross-pairs between distinct images."""
    imgs = IM.synthetic_textured_images(
        spark, n=12, size=32, dup_of={100: 0, 101: 1, 102: 2, 103: 3}
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in IM.image_near_dup_pairs(imgs, 3).collect()}
    assert pairs == {(0, 100): 0, (1, 101): 0, (2, 102): 0, (3, 103): 0}
    # hamming column equals a python popcount over the dhash pair
    hs = {r.image_id: r.dhash for r in IM.image_dhash(imgs).collect()}
    for (a, b), d in pairs.items():
        assert bin((hs[a] ^ hs[b]) & (2**64 - 1)).count("1") == d


def test_audio_fingerprint_near_dup(spark):
    """Energy-envelope fingerprint: gain-scaled copies pair at hamming 0;
    distinct noise clips stay apart; kernel is gain-invariant and
    content-sensitive."""
    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV

    rows = []
    sigs = []
    for i in range(8):
        rng = np.random.default_rng(90 + i)
        # amplitude-modulated noise → structured envelope (distinct shapes)
        env = rng.uniform(0.1, 1.0, 65).repeat(130)[:8192]
        sig = (rng.uniform(-1, 1, 8192) * env * 12000).astype(np.int16)
        sigs.append(sig)
        rows.append((i, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(sig)))
    # planted dups: exact half-gain copies (monotone integer scaling)
    for i in range(3):
        rows.append((100 + i, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(sigs[i] // 2)))

    # kernel invariants first (no Spark needed)
    h0 = AV.audio_fingerprint_kernel(sigs[0])
    assert AV.audio_fingerprint_kernel(sigs[0] // 2) == h0
    pop = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert pop(h0, AV.audio_fingerprint_kernel(sigs[1])) > 10

    audio = spark.createDataFrame(rows, AV.AUDIO_TABLE_SCHEMA)
    pairs = {(r.id_a, r.id_b): r.hamming for r in AV.audio_near_dup_pairs(audio, 3).collect()}
    assert pairs == {(0, 100): 0, (1, 101): 0, (2, 102): 0}


def test_video_near_dup_pairs(spark):
    """Frame-level video dedup: a brightness-shifted re-render pairs with
    its source (all sampled frames match); distinct videos don't pair."""
    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV

    rows = []
    vids = []
    for i in range(5):
        rng = np.random.default_rng(70 + i)
        frames = rng.integers(0, 200, (20, 24, 24, 3)).astype(np.uint8)
        vids.append(frames)
        rows.append((i, "raw-frames", 24, 24, 20, AV.encode_raw_video(frames)))
    for i in range(2):  # planted re-renders (no saturation → dhash-identical)
        bright = np.clip(vids[i].astype(np.int32) + 10, 0, 255).astype(np.uint8)
        rows.append((100 + i, "raw-frames", 24, 24, 20, AV.encode_raw_video(bright)))

    video = spark.createDataFrame(rows, AV.VIDEO_TABLE_SCHEMA)
    pairs = {
        (r.vid_a, r.vid_b): r.n_matching_frames
        for r in AV.video_near_dup_pairs(video, every_n=5, min_matching_frames=3).collect()
    }
    assert pairs == {(0, 100): 4, (1, 101): 4}, pairs


def test_phash_brightness_invariance_and_separation():
    """pHash properties: exact invariance under uniform brightness shift
    (DC excluded, no clipping), far hamming for unrelated noise images,
    top bit always zero (63 data bits)."""
    rng = np.random.default_rng(11)
    hs = []
    for i in range(6):
        img = rng.integers(0, 200, (32, 32, 3)).astype(np.uint8)
        h = IM.phash_kernel(img)
        assert h >= 0
        shifted = np.clip(img.astype(np.int32) + 17, 0, 255).astype(np.uint8)
        assert IM.phash_kernel(shifted) == h
        hs.append(h)
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert bin(hs[i] ^ hs[j]).count("1") > 8


def test_phash_near_dup_pairs_find_planted(spark):
    """Planted brightness-shifted copies pair at hamming 0 through the
    banded join; no spurious pairs among the unrelated noise images."""
    imgs = IM.synthetic_textured_images(
        spark, n=10, size=32, dup_of={100: 0, 101: 4}
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             IM.image_near_dup_pairs_phash(imgs, max_hamming=3).collect()}
    assert pairs[(0, 100)] == 0 and pairs[(4, 101)] == 0
    assert len(pairs) == 2


def test_png_codec_roundtrip_all_filters():
    """Pure-Python PNG codec: encode→decode is the identity for every
    per-row filter type (None/Sub/Up/Average/Paeth, RFC 2083 §6), on
    random (incompressible) and structured (filter-friendly) content."""
    rng = np.random.default_rng(123)
    noisy = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[..., 0] = np.arange(16, dtype=np.uint8)[None, :] * 16
    grad[..., 1] = np.arange(16, dtype=np.uint8)[:, None] * 16
    grad[..., 2] = 7
    for img in (noisy, grad):
        for filters in (None, [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            blob = IM.encode_png(img, row_filters=filters)
            assert np.array_equal(IM.decode_png(blob), img)
    # structured content must actually compress under the non-trivial filters
    assert len(IM.encode_png(grad, row_filters=[1])) < len(
        IM.encode_png(grad, row_filters=[0])
    )


def test_png_gray_and_rgba_color_types():
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(7)
    sig = b"\x89PNG\r\n\x1a\n"
    gray = rng.integers(0, 256, (5, 7, 1)).astype(np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(5))
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(IM.decode_png(png), np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(5))
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(IM.decode_png(png), rgba[..., :3])
    with pytest.raises(ValueError):
        IM.decode_png(b"nope" * 4)


def test_png_fingerprints_match_raw_rgb(spark):
    """A PNG-ingested corpus must produce the IDENTICAL dHash/pHash stream
    as the same pixels ingested raw — the codec is lossless, so the
    fingerprint dedup keys cannot depend on the container format."""
    rng = np.random.default_rng(42)
    rows_raw, rows_png = [], []
    for i in range(4):
        img = rng.integers(0, 200, (24, 24, 3)).astype(np.uint8)
        rows_raw.append((i, f"i{i}.raw", "raw-rgb", 24, 24, IM.encode_raw_rgb(img)))
        rows_png.append(
            (i, f"i{i}.png", "png", 24, 24, IM.encode_png(img, row_filters=[0, 1, 2, 3, 4]))
        )
    raw_df = spark.createDataFrame(rows_raw, IM.IMAGE_TABLE_SCHEMA)
    png_df = spark.createDataFrame(rows_png, IM.IMAGE_TABLE_SCHEMA)
    raw_d = {r.image_id: r.dhash for r in IM.image_dhash(raw_df).collect()}
    png_d = {r.image_id: r.dhash for r in IM.image_dhash(png_df).collect()}
    assert raw_d == png_d
    raw_p = {r.image_id: r.phash for r in IM.image_phash(raw_df).collect()}
    png_p = {r.image_id: r.phash for r in IM.image_phash(png_df).collect()}
    assert raw_p == png_p


def test_wav_codec_roundtrip_and_parity():
    """Pure-stdlib WAV: encode→decode recovers the exact sample values of
    the raw-PCM path (lossless container, same /32768 normalization);
    8-bit and multi-channel WAVs decode with the documented downmix."""
    import io
    import struct as _struct
    import wave

    from bensp_suite_spark.multimodal import audio_video as AV

    rng = np.random.default_rng(3)
    sig = (rng.uniform(-1, 1, 4096) * 20000).astype(np.int16)
    via_wav = AV.decode_audio(AV.encode_wav(sig), "wav")
    via_pcm = AV.decode_audio(AV.encode_pcm_s16le(sig), "pcm-s16le")
    assert np.array_equal(via_wav, via_pcm)
    # stereo downmix = mean of channels
    stereo = np.stack([sig, (sig // 2)], axis=1)
    mixed = AV.decode_audio(AV.encode_wav(stereo.reshape(-1), channels=2), "wav")
    expect = (sig / 32768.0 + (sig // 2) / 32768.0) / 2.0
    assert np.allclose(mixed, expect, atol=0, rtol=0)
    # 8-bit unsigned path
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    d = AV.decode_wav(buf.getvalue())
    assert np.allclose(d, [(0 - 128) / 128.0, 0.0, (255 - 128) / 128.0])


def test_wav_fingerprint_matches_pcm(spark):
    """A WAV-ingested corpus must produce the identical fingerprint
    stream as the same samples ingested raw — container-independence of
    the dedup key, like the PNG/raw-rgb image parity."""
    from bensp_suite_spark.multimodal import audio_video as AV

    rng = np.random.default_rng(21)
    rows_pcm, rows_wav = [], []
    for i in range(3):
        sig = (rng.uniform(-1, 1, 8192) * 15000).astype(np.int16)
        rows_pcm.append((i, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(sig)))
        rows_wav.append((i, "wav", 16000, 1, AV.encode_wav(sig)))
    pcm_df = spark.createDataFrame(rows_pcm, AV.AUDIO_TABLE_SCHEMA)
    wav_df = spark.createDataFrame(rows_wav, AV.AUDIO_TABLE_SCHEMA)
    pcm_f = {r.media_id: r.fingerprint for r in AV.audio_fingerprints(pcm_df).collect()}
    wav_f = {r.media_id: r.fingerprint for r in AV.audio_fingerprints(wav_df).collect()}
    assert pcm_f == wav_f


def test_avi_codec_roundtrip():
    """Pure-Python uncompressed AVI: encode→decode is the identity,
    including odd widths (4-byte row stride padding), single frames, and
    the BGR/bottom-up DIB conventions."""
    from bensp_suite_spark.multimodal import audio_video as AV

    rng = np.random.default_rng(11)
    for shape in [(5, 24, 24, 3), (3, 17, 13, 3), (1, 2, 2, 3), (4, 8, 7, 3)]:
        frames = rng.integers(0, 256, shape).astype(np.uint8)
        blob = AV.encode_avi_rgb(frames)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
        assert np.array_equal(AV.decode_avi_rgb(blob), frames)
        assert np.array_equal(AV.decode_video(blob, "avi"), frames)
    with pytest.raises(ValueError):
        AV.decode_avi_rgb(b"RIFX" + b"\x00" * 32)


def test_avi_frame_hashes_match_raw(spark):
    """An AVI-ingested corpus must produce the identical frame-dHash
    stream as the same frames ingested raw — container-independence of
    the video dedup evidence (like WAV/PCM and PNG/raw-rgb)."""
    from bensp_suite_spark.multimodal import audio_video as AV

    rng = np.random.default_rng(33)
    rows_raw, rows_avi = [], []
    for i in range(3):
        frames = rng.integers(0, 200, (10, 16, 16, 3)).astype(np.uint8)
        rows_raw.append((i, "raw-frames", 16, 16, 10, AV.encode_raw_video(frames)))
        rows_avi.append((i, "avi", 16, 16, 10, AV.encode_avi_rgb(frames)))
    raw_df = spark.createDataFrame(rows_raw, AV.VIDEO_TABLE_SCHEMA)
    avi_df = spark.createDataFrame(rows_avi, AV.VIDEO_TABLE_SCHEMA)
    key = lambda r: (r.media_id, r.frame_idx)
    raw_h = {key(r): r.dhash for r in AV.video_frame_dhashes(raw_df, every_n=3).collect()}
    avi_h = {key(r): r.dhash for r in AV.video_frame_dhashes(avi_df, every_n=3).collect()}
    assert raw_h == avi_h


def test_avi_frame_chunk_before_strf_is_a_format_error():
    """A malformed AVI whose first '00db' frame chunk precedes the strf
    stream-format header must fail with a clear ValueError, not an opaque
    TypeError from the stride arithmetic on w=None (ADVICE r3)."""
    import struct

    from bensp_suite_spark.multimodal import audio_video as AV

    frame = b"\x00" * 12
    chunk = b"00db" + struct.pack("<I", len(frame)) + frame
    body = b"AVI " + chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="frame chunk before strf"):
        AV.decode_avi_rgb(blob)


def test_jpeg_codec_round_trip_fidelity():
    """Pure-Python baseline JPEG: smooth content must round-trip with
    small error at high quality (q100 near-lossless), in both 4:4:4 and
    4:2:0, including odd (non-MCU-multiple) sizes. Reference ingests
    JPEG via libjpeg (apps/ferret/src/image/image.c:314-358)."""
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    for h, w in [(32, 32), (17, 23), (8, 8), (40, 24)]:
        x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
        y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
        img = np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)
        out444 = decode_jpeg(encode_jpeg(img, quality=95, subsample=False))
        assert out444.shape == img.shape
        assert np.abs(out444.astype(int) - img.astype(int)).max() <= 4
        out420 = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
        # 4:2:0 replication upsampling stair-steps a steep chroma
        # gradient; over an 8-px image the full 0→255 ramp spans only 4
        # chroma samples, so allow proportionally more error there
        bound = 8.0 if min(h, w) <= 8 else 4.0
        assert np.abs(out420.astype(int) - img.astype(int)).mean() < bound

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100, subsample=False))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 1.0

    flat = np.full((16, 16, 3), 120, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, quality=90)), flat
    )


def test_jpeg_codec_grayscale_and_restart_markers():
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95, subsample=False))
    assert out.shape == (16, 16, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()

    x = np.linspace(0, 255, 40)[None, :] * np.ones((56, 1))
    y = np.linspace(0, 255, 56)[:, None] * np.ones((1, 40))
    img = np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(img, 90, subsample=sub))
        for ri in (1, 2, 5):
            # DRI/RSTn must not change a single pixel vs the no-RST stream
            out = decode_jpeg(
                encode_jpeg(img, 90, subsample=sub, restart_interval=ri)
            )
            assert np.array_equal(out, base)


def test_jpeg_codec_rejects_bad_streams():
    import struct

    from bensp_suite_spark.multimodal.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    # progressive (SOF2) is out of scope and must say so
    sof2 = (b"\xFF\xD8" + b"\xFF\xC2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(sof2)
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")


def test_decode_image_routes_jpeg_through_pure_codec():
    """fmt='jpeg' must use the bit-deterministic pure decoder (goldens
    depend on it); fmt='jpeg-libjpeg' may prefer Pillow but falls back to
    the pure decoder in this container."""
    from bensp_suite_spark.multimodal import images as IM
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    blob = encode_jpeg(img, quality=90)
    assert np.array_equal(IM.decode_image(blob, "jpeg"), decode_jpeg(blob))
    out = IM.decode_image(blob, "jpeg-libjpeg")
    assert out.shape == (16, 16, 3)


def test_jpeg_codec_422_subsampling():
    """4:2:2 exercises the (2,1) sampling-factor decode path (the third
    real-world chroma layout); bool aliases stay byte-identical to their
    string forms."""
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 24)[None, :] * np.ones((40, 1))
    y = np.linspace(0, 255, 40)[:, None] * np.ones((1, 24))
    img = np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample="422"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 5.0
    assert encode_jpeg(img, 85, True) == encode_jpeg(img, 85, "420")
    assert encode_jpeg(img, 85, False) == encode_jpeg(img, 85, "444")
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, 85, "411")


def test_jpeg_codec_hypothesis_round_trip():
    """Property: any uint8 RGB image of any small odd/even shape encodes
    to a parseable stream and decodes to the right shape with bounded
    error at q=100 (near-lossless regime), under every subsampling mode
    and with restart markers."""
    from hypothesis import given, settings, strategies as st

    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 33),
        w=st.integers(1, 33),
        seed=st.integers(0, 2**31 - 1),
        mode=st.sampled_from(["444", "422", "420"]),
        ri=st.sampled_from([0, 3]),
    )
    def check(h, w, seed, mode, ri):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100, subsample=mode,
                                      restart_interval=ri))
        assert out.shape == img.shape
        if mode == "444":
            # q=100 luma+chroma quant ≈ 1 → near-lossless
            assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0

    check()


def test_flac_codec_roundtrip_and_compression():
    """FLAC is lossless: every encode→decode is bit-exact; predictable
    signals must actually compress (fixed predictors + Rice working)."""
    from bensp_suite_spark.multimodal.flac import decode_flac, encode_flac

    t = np.arange(20000)
    smooth = (3000 * np.sin(t / 50) + 2000 * np.sin(t / 7)).astype(np.int16)
    enc = encode_flac(smooth, sample_rate=16000)
    dec, rate, bps = decode_flac(enc)
    assert rate == 16000 and bps == 16
    assert (dec[:, 0] == smooth).all()
    assert len(enc) < smooth.nbytes // 2  # real compression, not VERBATIM

    rng = np.random.default_rng(7)
    noise = (rng.uniform(-1, 1, 8192) * 12000).astype(np.int16)
    dec, _, _ = decode_flac(encode_flac(noise))
    assert (dec[:, 0] == noise).all()

    # constant + empty edge cases
    assert (decode_flac(encode_flac(np.full(5000, -123, np.int16)))[0][:, 0]
            == -123).all()
    assert decode_flac(encode_flac(np.zeros(0, np.int16)))[0].shape[0] == 0


def test_flac_codec_every_decoder_path():
    """Exercise each wire-format variant round-trip: all four stereo
    decorrelations (side channel at bps+1), LPC subframes, partitioned
    Rice, 5-bit RICE2 params, wasted bits, 8/24-bit, odd sample rate and
    block size (end-of-header header forms)."""
    from bensp_suite_spark.multimodal.flac import decode_flac, encode_flac

    t = np.arange(8192)
    base = (3000 * np.sin(t / 40) + 500 * np.sin(t / 3)).astype(np.int16)
    st2 = np.stack([base, base // 2 + 50], axis=1)

    for mode in ("independent", "left-side", "right-side", "mid-side"):
        dec, _, _ = decode_flac(encode_flac(st2, stereo_mode=mode))
        assert (dec == st2).all(), mode

    for kw in (
        dict(force_lpc=True),
        dict(partition_order=3),
        dict(rice2=True),
        dict(partition_order=2, rice2=True, force_lpc=True),
    ):
        dec, _, _ = decode_flac(encode_flac(base, **kw))
        assert (dec[:, 0] == base).all(), kw

    wasted = (base // 8) * 8  # low bits zero → wasted-bits path
    dec, _, _ = decode_flac(encode_flac(wasted, detect_wasted=True))
    assert (dec[:, 0] == wasted).all()

    small = (base // 256).astype(np.int64)
    dec, _, bps = decode_flac(encode_flac(small, bits_per_sample=8))
    assert bps == 8 and (dec[:, 0] == small).all()

    wide = base.astype(np.int64) * 200
    dec, _, bps = decode_flac(encode_flac(wide, bits_per_sample=24))
    assert bps == 24 and (dec[:, 0] == wide).all()

    dec, rate, _ = decode_flac(
        encode_flac(base[:5000], sample_rate=12345, block_size=1000)
    )
    assert rate == 12345 and (dec[:, 0] == base[:5000]).all()


def test_flac_malformed_inputs_raise_typed_errors():
    from bensp_suite_spark.multimodal.flac import (
        FlacFormatError,
        decode_flac,
        encode_flac,
    )

    with pytest.raises(FlacFormatError, match="fLaC marker"):
        decode_flac(b"flaC" + bytes(64))
    sig = (np.sin(np.arange(4000) / 9) * 5000).astype(np.int16)
    enc = bytearray(encode_flac(sig))
    enc[len(enc) // 2] ^= 0x40  # flip a payload bit → CRC-16 must trip
    with pytest.raises(FlacFormatError):
        decode_flac(bytes(enc))
    with pytest.raises(FlacFormatError):  # truncation
        decode_flac(bytes(encode_flac(sig))[:-40])


def test_flac_fingerprint_matches_pcm(spark):
    """decode_audio('flac') must reproduce the exact raw samples: the
    envelope fingerprint of a FLAC payload equals the raw-PCM one (the
    codec-independence property the golden pin relies on)."""
    from bensp_suite_spark.multimodal import audio_video as AV
    from bensp_suite_spark.multimodal.flac import encode_flac

    rng = np.random.default_rng(90)
    env = rng.uniform(0.1, 1.0, 65).repeat(130)[:8192]
    sig = (rng.uniform(-1, 1, 8192) * env * 12000).astype(np.int16)
    rows = [
        (0, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(sig)),
        (1, "flac", 16000, 1, encode_flac(sig)),
    ]
    audio = spark.createDataFrame(rows, AV.AUDIO_TABLE_SCHEMA).coalesce(1)
    fp = {r.media_id: r.fingerprint for r in AV.audio_fingerprints(audio).collect()}
    assert fp[0] == fp[1]
    assert fp[0] == AV.audio_fingerprint_kernel(sig)


def test_flac_codec_hypothesis_round_trip():
    """Property: any int16 signal of any length/channel-count round-trips
    bit-exactly under every stereo mode × residual-coding configuration."""
    from hypothesis import given, settings, strategies as st

    from bensp_suite_spark.multimodal.flac import decode_flac, encode_flac

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 700),
        channels=st.integers(1, 2),
        seed=st.integers(0, 2**31 - 1),
        mode=st.sampled_from(["independent", "left-side", "right-side", "mid-side"]),
        po=st.sampled_from([0, 2]),
        rice2=st.booleans(),
        lpc=st.booleans(),
        kind=st.sampled_from(["noise", "smooth", "steps"]),
    )
    def check(n, channels, seed, mode, po, rice2, lpc, kind):
        rng = np.random.default_rng(seed)
        if kind == "noise":
            sig = rng.integers(-32768, 32768, (n, channels)).astype(np.int64)
        elif kind == "smooth":
            t = np.arange(n)[:, None]
            sig = (rng.uniform(500, 8000) * np.sin(t / rng.uniform(3, 80))
                   ).astype(np.int64) + rng.integers(-100, 100, (n, channels))
        else:
            sig = rng.integers(-4, 4, (n, channels)).astype(np.int64) * 512
        if channels == 1:
            sig = sig[:, 0]
        enc = encode_flac(sig, block_size=256, stereo_mode=mode,
                          partition_order=po, rice2=rice2, force_lpc=lpc)
        dec, _, _ = decode_flac(enc)
        want = sig if sig.ndim == 2 else sig[:, None]
        assert dec.shape == want.shape
        assert (dec == want).all()

    check()


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF) muxer/demuxer — MJPEG sample entries through the pure codec
# ---------------------------------------------------------------------------


def test_mp4_container_is_lossless_around_jpeg_samples():
    import numpy as np

    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from bensp_suite_spark.multimodal.mp4 import demux_mp4, encode_mp4_mjpeg

    rng = np.random.default_rng(41)
    frames = rng.integers(0, 255, (7, 16, 24, 3)).astype(np.uint8)
    payload = encode_mp4_mjpeg(frames, fps=30)
    fourcc, samples = demux_mp4(payload)
    assert fourcc == b"jpeg" and len(samples) == 7
    # demuxed sample bytes == direct per-frame encodes (container adds nothing)
    for i, s in enumerate(samples):
        assert s == encode_jpeg(frames[i], quality=90, subsample=True)
        assert decode_jpeg(s).shape == (16, 24, 3)


def test_mp4_demux_handles_general_chunking():
    # hand-build a TWO-chunk file (chunk1: 2 samples, then a 6-byte gap,
    # chunk2: 1 sample) to positively exercise the general stsc expansion
    # and prove the demuxer follows stco offsets, not mdat order
    import struct

    import numpy as np

    from bensp_suite_spark.multimodal import mp4 as M
    from bensp_suite_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(42)
    frames = rng.integers(0, 255, (3, 16, 16, 3)).astype(np.uint8)
    samples = [encode_jpeg(f, quality=90, subsample=True) for f in frames]
    sizes = [len(s) for s in samples]

    ref = M.encode_mp4_mjpeg(frames)  # donor for everything except stbl/mdat
    ftyp_len = ref.index(b"mdat") - 4
    off0 = ftyp_len + 8
    mdat_body = samples[0] + samples[1] + b"GAPGAP" + samples[2]

    # swap the writer's single-chunk tables for the two-chunk layout by
    # rebuilding moov from the donor's moov with patched stsc/stco and an
    # identical-size guarantee: stsc gains one 12-byte entry, stco one
    # 4-byte offset, so patch parent sizes via full re-mux of the boxes.
    old_stsc = M._full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
    new_stsc = M._full(b"stsc", 0, 0, struct.pack(">IIIIIII", 2, 1, 2, 1, 2, 1, 1))
    old_stco = M._full(b"stco", 0, 0, struct.pack(">II", 1, off0))
    new_stco = M._full(
        b"stco", 0, 0, struct.pack(">III", 2, off0, off0 + sizes[0] + sizes[1] + 6)
    )
    moov = ref[ref.index(b"moov") - 4 :]
    assert old_stsc in moov and old_stco in moov
    # grow every enclosing box size (moov>trak>mdia>minf>stbl) by the 16
    # added bytes, outermost first, then swap the leaf tables
    grown = moov
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = grown.index(tag) - 4
        (sz,) = struct.unpack_from(">I", grown, i)
        grown = grown[:i] + struct.pack(">I", sz + 16) + grown[i + 4 :]
    grown = grown.replace(old_stsc, new_stsc).replace(old_stco, new_stco)

    buf = ref[:ftyp_len] + M._box(b"mdat", mdat_body) + grown
    fourcc, got = M.demux_mp4(buf)
    assert fourcc == b"jpeg"
    assert got == samples  # exact bytes, across the gap


def test_mp4_malformed_inputs_raise_typed_errors():
    import numpy as np
    import pytest

    from bensp_suite_spark.multimodal import mp4 as M

    rng = np.random.default_rng(43)
    frames = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    payload = M.encode_mp4_mjpeg(frames)
    with pytest.raises(ValueError, match="ftyp"):
        M.demux_mp4(b"\x00" * 32)
    with pytest.raises(ValueError):
        M.demux_mp4(payload[:48])  # truncated mdat
    with pytest.raises(ValueError, match="no moov"):
        M.demux_mp4(payload[: payload.index(b"moov") - 4])


def test_mp4_fragmented_demuxes_identically_to_flat():
    """fMP4 (moof/mdat fragments — the DASH/HLS/live layout): the
    fragment walk must recover exactly the flat mux's samples at any
    fragment grouping, and the full decode path must agree."""
    import numpy as np

    from bensp_suite_spark.multimodal import mp4 as M

    rng = np.random.default_rng(46)
    frames = rng.integers(0, 255, (5, 24, 32, 3)).astype(np.uint8)
    flat = M.encode_mp4_mjpeg(frames)
    fc_flat, flat_samples = M.demux_mp4(flat)
    for spf in (1, 2, 5):
        frag = M.encode_mp4_mjpeg_fragmented(frames, samples_per_fragment=spf)
        fourcc, samples = M.demux_mp4(frag)
        assert fourcc == fc_flat == b"jpeg"
        assert samples == flat_samples
        assert (M.decode_mp4_mjpeg(frag) == M.decode_mp4_mjpeg(flat)).all()


def test_mp4_fragmented_hostile_bytes_stay_typed():
    """Bit-flipped fragmented files must raise typed ValueError /
    NotImplementedError — never raw struct/index errors (the same
    never-crashes contract as the flat path)."""
    import random

    import numpy as np

    from bensp_suite_spark.multimodal import mp4 as M

    rng = np.random.default_rng(47)
    frames = rng.integers(0, 255, (3, 16, 16, 3)).astype(np.uint8)
    frag = M.encode_mp4_mjpeg_fragmented(frames, samples_per_fragment=2)
    rnd = random.Random(48)
    for _ in range(200):
        b = bytearray(frag)
        for _ in range(rnd.randint(1, 8)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            M.decode_mp4_mjpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # typed — the contract


def test_mp4_non_jpeg_sample_entry_is_environment_gated():
    import numpy as np
    import pytest

    from bensp_suite_spark.multimodal import mp4 as M

    rng = np.random.default_rng(44)
    frames = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    payload = M.encode_mp4_mjpeg(frames)
    # flip the sample entry fourcc to avc1: the demux must succeed, the
    # decode must raise the typed NotImplementedError naming the codec
    patched = payload.replace(b"jpeg", b"avc1", 1)
    fourcc, samples = M.demux_mp4(patched)
    assert fourcc == b"avc1" and len(samples) == 2
    with pytest.raises(NotImplementedError, match="avc1"):
        M.decode_mp4_mjpeg(patched)


def test_decode_video_routes_mp4_through_pure_demuxer():
    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV
    from bensp_suite_spark.multimodal import mp4 as M
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(45)
    frames = rng.integers(0, 255, (4, 24, 16, 3)).astype(np.uint8)
    try:
        import av  # noqa: F401

        return  # PyAV present: the ffmpeg path takes over, nothing to gate
    except ImportError:
        pass
    dec = AV.decode_video(M.encode_mp4_mjpeg(frames), "mp4")
    want = np.stack(
        [decode_jpeg(encode_jpeg(f, quality=90, subsample=True)) for f in frames]
    )
    assert np.array_equal(dec, want)


@pytest.mark.slow
def test_mp4_demux_never_crashes_on_arbitrary_bytes():
    """Fuzz the demuxer: any byte string either demuxes or raises a typed
    ValueError — never an unhandled struct/index error or a hang. Seeds
    include mutations of a valid file (bit flips land inside real box
    structures, the interesting failure surface)."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from bensp_suite_spark.multimodal import mp4 as M

    rng = np.random.default_rng(46)
    valid = M.encode_mp4_mjpeg(
        rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    )

    mutations = st.tuples(
        st.integers(0, len(valid) - 1), st.integers(0, 255)
    ).map(lambda t: valid[: t[0]] + bytes([t[1]]) + valid[t[0] + 1 :])

    @settings(max_examples=120, deadline=None)
    @given(st.one_of(st.binary(max_size=256), mutations))
    def check(buf):
        try:
            M.demux_mp4(buf)
        except (ValueError, NotImplementedError):
            pass
        # jpeg payload corruption surfaces at decode, not demux — decode
        # must also fail typed, never crash
        else:
            try:
                M.decode_mp4_mjpeg(buf)
            except (ValueError, NotImplementedError):
                pass

    check()


def test_media_decoders_never_crash_on_arbitrary_bytes():
    """The mp4 never-crashes contract, extended to every pure decoder:
    FLAC, WAV, AVI. Arbitrary bytes and bit-flipped valid files must
    raise typed errors (ValueError subclasses / EOFError from stdlib
    wave), never escape as raw struct/index/key errors."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV
    from bensp_suite_spark.multimodal import flac as FL

    rng = np.random.default_rng(47)
    sig = (rng.uniform(-1, 1, 2048) * 10000).astype(np.int16)
    frames = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    valid = {
        "flac": FL.encode_flac(sig),
        "wav": AV.encode_wav(sig),
        "avi": AV.encode_avi_rgb(frames),
    }

    def mutants(payload):
        return st.tuples(
            st.integers(0, len(payload) - 1), st.integers(0, 255)
        ).map(lambda t: payload[: t[0]] + bytes([t[1]]) + payload[t[0] + 1 :])

    decoders = {
        "flac": FL.decode_flac,
        "wav": AV.decode_wav,
        "avi": AV.decode_avi_rgb,
    }

    def make_check(decode, payload):
        @settings(max_examples=60, deadline=None)
        @given(st.one_of(st.binary(max_size=128), mutants(payload)))
        def check(buf):
            try:
                decode(buf)
            except (ValueError, EOFError, NotImplementedError):
                pass  # typed rejection is the contract

        return check

    for fmt, decode in decoders.items():
        make_check(decode, valid[fmt])()


@pytest.mark.slow
def test_image_decoders_never_crash_on_arbitrary_bytes():
    """The never-crashes contract for the image codecs (PNG chunk walk +
    zlib inflate; JPEG huffman/IDCT): mutated valid files and arbitrary
    bytes raise typed ValueError only."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from bensp_suite_spark.multimodal.images import decode_png, encode_png
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(48)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    valid = {"png": encode_png(img), "jpeg": encode_jpeg(img)}
    decoders = {"png": decode_png, "jpeg": decode_jpeg}

    def make_check(decode, payload):
        mutants = st.tuples(
            st.integers(0, len(payload) - 1), st.integers(0, 255)
        ).map(lambda t: payload[: t[0]] + bytes([t[1]]) + payload[t[0] + 1 :])

        @settings(max_examples=80, deadline=None)
        @given(st.one_of(st.binary(max_size=128), mutants))
        def check(buf):
            try:
                decode(buf)
            except (ValueError, NotImplementedError):
                pass

        return check

    for fmt in decoders:
        make_check(decoders[fmt], valid[fmt])()


def test_fmp4_trex_default_sample_size_fallback():
    """A third-party fMP4 that carries sample sizes ONLY in mvex/trex
    (no trun sizes, no tfhd default — legal per ISO 14496-12 §8.8.3)
    must demux to the same samples as the explicit-size layout (ADVICE
    r6: the trex fallback was claimed in the error message but never
    parsed)."""
    import struct

    import numpy as np

    from bensp_suite_spark.multimodal import mp4 as M

    frame = np.tile(
        np.arange(48, dtype=np.uint8).reshape(1, 16, 3), (16, 1, 1)
    )
    frames = np.stack([frame, frame])  # identical frames → identical sizes
    buf = M.encode_mp4_mjpeg_fragmented(frames, samples_per_fragment=2)
    fourcc, samples = M.demux_mp4(buf)
    assert len(samples) == 2 and samples[0] == samples[1]
    size = len(samples[0])

    # rebuild: ftyp + moov (trex.default_sample_size patched in) + one
    # moof whose trun has NO per-sample sizes + the same mdat
    top = list(M._boxes(buf, 0, len(buf)))
    (f0, f1) = next((b0, b1) for t, b0, b1 in top if t == b"ftyp")
    ftyp = buf[f0 - 8 : f1]
    (m0, m1) = next((b0, b1) for t, b0, b1 in top if t == b"moov")
    t0, _t1 = M._find(buf, m0, m1, [b"mvex", b"trex"])
    moov = bytearray(buf[m0 - 8 : m1])
    rel = (t0 + 4 + 12) - (m0 - 8)  # trex default_sample_size field
    moov[rel : rel + 4] = struct.pack(">I", size)
    mfhd = M._full(b"mfhd", 0, 0, struct.pack(">I", 1))
    tfhd = M._full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))

    def trun(off: int) -> bytes:
        return M._full(b"trun", 0, 0x000001, struct.pack(">Ii", 2, off))

    moof_len = len(M._box(b"moof", mfhd + M._box(b"traf", tfhd + trun(0))))
    moof = M._box(b"moof", mfhd + M._box(b"traf", tfhd + trun(moof_len + 8)))
    rebuilt = ftyp + bytes(moov) + moof + M._box(b"mdat", b"".join(samples))

    fourcc2, samples2 = M.demux_mp4(rebuilt)
    assert fourcc2 == fourcc and samples2 == samples
    # and the chain still fails TYPED when no size source exists at all
    moov_nosize = bytearray(buf[m0 - 8 : m1])  # trex size stays 0
    broken = ftyp + bytes(moov_nosize) + moof + M._box(b"mdat", b"".join(samples))
    import pytest

    with pytest.raises(ValueError, match="no size"):
        M.demux_mp4(broken)


def test_audio_snippet_search_recovers_planted_offsets(spark):
    """Landmark fingerprinting ground truth (independent of the golden
    pin): a snippet cut at sample offset o from track i must match
    (i, o // HOP) as its TOP result with a vote count orders of
    magnitude above the collision floor, including an amplitude-halved
    cut (relative peak threshold ⇒ gain-invariant constellation)."""
    import numpy as np

    from bensp_suite_spark.multimodal import audio_landmarks as AL
    from bensp_suite_spark.multimodal import audio_video as AV

    tracks, rows = [], []
    for i in range(4):
        rng = np.random.default_rng(700 + i)
        env = rng.uniform(0.1, 1.0, 129).repeat(256)[:32768]
        sig = (rng.uniform(-1, 1, 32768) * env * 12000).astype(np.int16)
        tracks.append(sig)
        rows.append((i, "pcm-s16le", 16000, 1, AV.encode_pcm_s16le(sig)))
    corpus = spark.createDataFrame(rows, AV.AUDIO_TABLE_SCHEMA)
    cuts = {0: (1, 7680), 1: (3, 12800), 2: (1, 512)}
    snips = [
        (q, "pcm-s16le", 16000, 1,
         AV.encode_pcm_s16le(tracks[t][o:o + 8192]))
        for q, (t, o) in cuts.items()
    ] + [
        (9, "pcm-s16le", 16000, 1,
         AV.encode_pcm_s16le((tracks[0][2560:10752] // 2).astype(np.int16)))
    ]
    sdf = spark.createDataFrame(snips, AV.AUDIO_TABLE_SCHEMA)
    got = {
        r["query_id"]: (r["media_id"], r["offset_frames"], r["votes"])
        for r in AL.snippet_match(sdf, AL.extract_landmarks(corpus), k=1).collect()
    }
    for q, (t, o) in cuts.items():
        mid, off, votes = got[q]
        assert (mid, off) == (t, o // AL.HOP)
        assert votes > 100
    mid, off, votes = got[9]
    assert (mid, off) == (0, 2560 // AL.HOP) and votes > 100


def test_video_clip_search_recovers_planted_offsets(spark):
    """Clip localization ground truth (independent of the golden pin): an
    n-frame clip cut at frame offset o from video v must match (v, o) as
    its top result with exactly n votes (exact dHash equality on exact
    frame copies)."""
    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV

    vids, rows = [], []
    for i in range(3):
        rng = np.random.default_rng(800 + i)
        frames = rng.integers(0, 200, (20, 24, 24, 3)).astype(np.uint8)
        vids.append(frames)
        rows.append((i, "raw-frames", 24, 24, 20, AV.encode_raw_video(frames)))
    corpus = spark.createDataFrame(rows, AV.VIDEO_TABLE_SCHEMA)
    cuts = {0: (2, 5, 6), 1: (0, 11, 9)}
    clips = spark.createDataFrame(
        [
            (q, "raw-frames", 24, 24, n, AV.encode_raw_video(vids[v][o:o + n]))
            for q, (v, o, n) in cuts.items()
        ],
        AV.VIDEO_TABLE_SCHEMA,
    )
    got = {
        r["query_id"]: (r["media_id"], r["offset_frames"], r["votes"])
        for r in AV.clip_match(
            clips, AV.video_frame_dhashes(corpus, every_n=1), k=1
        ).collect()
    }
    for q, (v, o, n) in cuts.items():
        assert got[q] == (v, o, n)


def test_video_clip_search_reencoded_needs_banded_hamming(spark):
    """Re-encoded clip ground truth (independent of the golden pin):
    lossy-recompression-style sparse pixel noise flips a few dHash bits
    per frame, so the EXACT hash join loses votes below the threshold
    for at least one clip, while the banded-hamming path
    (max_hamming=3) still localizes EVERY clip to its true
    (video, offset) — and both paths agree exactly on unperturbed
    clips (banding is a recall mechanism, never a scoring change)."""
    import numpy as np

    from bensp_suite_spark.multimodal import audio_video as AV

    vids, rows = [], []
    for i in range(3):
        rng = np.random.default_rng(800 + i)
        frames = rng.integers(0, 200, (20, 24, 24, 3)).astype(np.uint8)
        vids.append(frames)
        rows.append((i, "raw-frames", 24, 24, 20, AV.encode_raw_video(frames)))
    corpus = spark.createDataFrame(rows, AV.VIDEO_TABLE_SCHEMA)
    index = AV.video_frame_dhashes(corpus, every_n=1).localCheckpoint(eager=True)
    cuts = {0: (2, 5, 8), 1: (0, 11, 8), 2: (1, 3, 8)}

    def perturbed(q, v, o, n):
        cut = vids[v][o : o + n].astype(np.int32)
        nr = np.random.default_rng(900 + q)
        mask = nr.random(cut.shape) < 0.3
        noise = nr.integers(-20, 21, cut.shape) * mask
        return np.clip(cut + noise, 0, 255).astype(np.uint8)

    clips = spark.createDataFrame(
        [
            (q, "raw-frames", 24, 24, n, AV.encode_raw_video(perturbed(q, v, o, n)))
            for q, (v, o, n) in cuts.items()
        ],
        AV.VIDEO_TABLE_SCHEMA,
    )
    banded = {
        r["query_id"]: (r["media_id"], r["offset_frames"])
        for r in AV.clip_match(clips, index, k=1, max_hamming=3).collect()
    }
    for q, (v, o, n) in cuts.items():
        assert banded[q] == (v, o)  # every clip localized despite noise
    exact = {
        r["query_id"]: (r["media_id"], r["offset_frames"], r["votes"])
        for r in AV.clip_match(clips, index, k=1).collect()
    }
    banded_votes = {
        r["query_id"]: r["votes"]
        for r in AV.clip_match(clips, index, k=1, max_hamming=3).collect()
    }
    # the exact path demonstrably degrades on re-encoded input: it loses
    # votes everywhere it appears, and at least one clip drops out or
    # falls below the banded path's evidence
    assert any(
        q not in exact or exact[q][2] < banded_votes[q] for q in cuts
    )
    # parity on unperturbed clips: banding changes recall, not answers
    clean = spark.createDataFrame(
        [
            (q, "raw-frames", 24, 24, n, AV.encode_raw_video(vids[v][o : o + n]))
            for q, (v, o, n) in cuts.items()
        ],
        AV.VIDEO_TABLE_SCHEMA,
    )
    e = sorted(map(tuple, AV.clip_match(clean, index, k=1).collect()))
    b = sorted(map(tuple, AV.clip_match(clean, index, k=1, max_hamming=3).collect()))
    # exact copies: both paths find the true offset with full votes (the
    # banded path may add near-match votes at other offsets, so compare
    # the top-1 identity, not the raw vote counts)
    assert [(r[0], r[1], r[2]) for r in e] == [(r[0], r[1], r[2]) for r in b]
    # out-of-range banding budgets fail with a clear error, not a
    # StopIteration from the band-count search (r9 ADVICE)
    import pytest

    for bad in (64, 100, -1):
        with pytest.raises(ValueError, match="max_hamming"):
            AV.clip_match(clips, index, k=1, max_hamming=bad)
