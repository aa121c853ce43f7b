"""Media fixture queries (plans/media_queries.py): generator
invariants, codec="builtin" pinning, and Spark-vs-truth agreement
(the driver repeats the same compare against DuckDB)."""

import hashlib
import sys
import types

import pytest

from hadoop_pcap_spark.operators import multimodal as MM
from hadoop_pcap_spark.plans import media_queries as MQ


def test_blob_ids_unique_and_cases_present():
    blobs = MQ.media_blobs()
    ids = [mid for mid, _, _ in blobs]
    assert len(ids) == len(set(ids))
    kinds = {it["img_format"] for _, _, it in blobs}
    assert {"png", "gif", "jpeg", "riff", "mp4?", "unknown"} <= kinds
    akinds = {it["aud_format"] for _, _, it in blobs}
    assert {"wav", "flac", "mp3", "ogg", "unknown"} <= akinds
    assert any(len(b) == 0 for _, b, _ in blobs), "empty-blob case required"


def test_header_parsers_recover_synthesis_intent():
    """The operator's pure-Python parsers must read back exactly the
    dimensions/rates the synthesizer wrote — for every parse-path
    blob (intent rows whose values differ from the stub formula)."""
    for mid, blob, it in MQ.media_blobs():
        if not blob:
            continue
        stub_w, stub_h = MQ._stub_image(blob)
        if (it["width"], it["height"]) != (stub_w, stub_h):
            assert MM._decode_image(blob, codec="builtin") == (
                it["width"], it["height"]), f"media_id={mid}"
        stub_d, stub_r = MQ._stub_audio(blob)
        if (it["duration_ms"], it["sample_rate"]) not in ((stub_d, stub_r), (None, None)):
            assert MM._decode_audio(blob, codec="builtin") == (
                it["duration_ms"], it["sample_rate"]), f"media_id={mid}"


def test_fit_policy_matches_operator():
    for w, h in [(640, 360), (4000, 1000), (120, 3000), (256, 256), (1, 1), (257, 257)]:
        assert MQ._fit(w, h) == MM._fit_dims(w, h, MQ.RESIZE_MAX_DIM)


def test_builtin_codec_ignores_installed_pil(monkeypatch):
    """codec='builtin' must not consult PIL even when importable —
    the fixture oracles' environment-independence guarantee."""
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def _boom(*a, **k):  # a codec that would reject synthetic headers
        raise OSError("cannot identify image file")

    image_mod.open = _boom
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    png = MQ._png(12, 34)
    assert MM._decode_image(png, codec="builtin") == (12, 34)
    with pytest.raises(ValueError):
        MM._decode_image(png, codec="auto")  # auto consults (fake) PIL


def test_wav_chunk_walk_edge_cases():
    odd = MQ._wav(16000, 1, 8, 333, fmt_first=False)
    assert MM._parse_wav(odd) == (333 * 1000 // 16000, 16000)
    assert MM._parse_wav(MQ._wav(22050, 1, 16, 0, include_data=False)) is None
    assert MM._parse_wav(MQ._wav(22050, 1, 16, 40, include_fmt=False)) is None


def test_spark_output_matches_truth(spark):
    """image/audio/resize/frames over the fixture parquet == the
    synthesis-intent truth rows (local twin of the driver's gate)."""
    truth = {mid: it for mid, _, it in MQ.media_blobs()}
    by_id = {mid: blob for mid, blob, _ in MQ.media_blobs()}

    img = {r.media_id: r for r in MQ.q_media_image_features(spark, "").collect()}
    assert set(img) == set(truth)
    for mid, r in img.items():
        it = truth[mid]
        assert (r.width, r.height) == (it["width"], it["height"]), mid
        assert r.format_guess == it["img_format"]
        assert r.content_sha == hashlib.sha256(by_id[mid]).hexdigest()

    aud = {r.media_id: r for r in MQ.q_media_audio_features(spark, "").collect()}
    for mid, r in aud.items():
        it = truth[mid]
        assert (r.duration_ms, r.sample_rate) == (it["duration_ms"], it["sample_rate"]), mid
        assert r.format_guess == it["aud_format"]

    rsz = {r.media_id: r for r in MQ.q_media_resize_dims(spark, "").collect()}
    for mid, r in rsz.items():
        it = truth[mid]
        assert (r.width, r.height) == MQ._fit(it["width"], it["height"]), mid
        assert r.resized is (None if it["width"] is None else False)

    frames = MQ.q_media_frame_sample(spark, "").collect()
    n_expected = sum(
        len(range(0, max(len(b), 1), MQ.FRAME_BYTES)) for b in by_id.values()
    )
    assert len(frames) == n_expected
    # empty blob yields exactly one frame: sha256 of b""
    empties = [r for r in frames if r.media_id == 22]
    assert len(empties) == 1
    assert empties[0].frame_sha == hashlib.sha256(b"").hexdigest()


# --- perceptual dedup (dHash) ------------------------------------------------


def test_dhash_encoding_and_brightness_invariance():
    """Same pixels re-encoded, or lifted by a constant ≤ the no-wrap
    bound, hash identically; distinct pictures do not; byte hashes of
    the copies all differ (the case md5 dedup misses)."""
    import hashlib

    from hadoop_pcap_spark.plans.media_queries import _dhash_blobs

    got = {mid: dh for mid, _, dh in _dhash_blobs()}
    md5s = {mid: hashlib.md5(b).hexdigest() for mid, b, _ in _dhash_blobs()}
    assert got[1] == got[2] == got[3]              # re-encode + lift
    assert len({md5s[1], md5s[2], md5s[3]}) == 3   # but bytes all differ
    assert got[4] == got[5]
    hashes = [got[i] for i in (1, 4, 6, 7, 8)]
    assert len(set(hashes)) == 5                   # distinct pictures split
    assert got[9] is None and got[10] is None      # sub-grid / corrupt


def test_dhash_operator_matches_intent(spark):
    """The decoded-raster hash equals the formula-raster hash for
    every fixture blob — decoder chain and shared dhash64 agree."""
    from hadoop_pcap_spark.operators.multimodal import image_dhash
    from hadoop_pcap_spark.plans.media_queries import (
        _dhash_blobs,
        dhash_fixture_path,
    )

    want = {mid: dh for mid, _, dh in _dhash_blobs()}
    got = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(spark.read.parquet(dhash_fixture_path())).collect()
    }
    assert got == want


def test_dhash_builtin_equals_pil_path():
    """When PIL is importable both decode paths feed dhash64 the same
    raster (PNG is lossless) — hash equality per blob."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from hadoop_pcap_spark.operators.multimodal import (
        _png_decode_rgb,
        dhash64,
    )
    from hadoop_pcap_spark.plans.media_queries import _dhash_blobs

    for mid, blob, want in _dhash_blobs():
        built = _png_decode_rgb(blob)
        if built is None:
            continue
        arr = np.asarray(PIL.open(io.BytesIO(blob)).convert("RGB"),
                         dtype=np.uint8)
        pil_rows = [bytes(arr[y].reshape(-1)) for y in range(arr.shape[0])]
        assert dhash64(arr.shape[1], arr.shape[0], pil_rows) == want
        assert dhash64(*built) == want


def test_png_bomb_and_acceptance_set_yield_null():
    """(r10 review findings) a crafted IHDR cannot size an unbounded
    inflate, and the PIL fast path accepts exactly the stdlib set so
    hashes cannot be host-dependent."""
    import struct
    import zlib

    from hadoop_pcap_spark.operators.multimodal import (
        _decode_png_raster,
        _png_accepted_ihdr,
        _png_decode_rgb,
    )

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    # decompression bomb: 60000x60000 declared, tiny IDAT
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1024))
            + chunk(b"IEND", b""))
    assert _png_accepted_ihdr(bomb) is None      # raster cap rejects
    assert _png_decode_rgb(bomb) is None
    assert _decode_png_raster(bomb) is None
    # interlaced and palette and 16-bit headers are rejected by the
    # SHARED gate (so PIL can never decode what the stdlib path won't)
    for depth, ctype, inter in ((8, 2, 1), (8, 3, 0), (16, 2, 0)):
        ih = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, inter)
        blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ih)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
                + chunk(b"IEND", b""))
        assert _png_accepted_ihdr(blob) is None
        assert _decode_png_raster(blob) is None


def test_audio_fingerprint_families():
    """Re-containered and gain-lifted copies collapse; distinct
    recordings split; sub-65-frame and truncated blobs are NULL; byte
    hashes of the copies all differ."""
    import hashlib

    from hadoop_pcap_spark.plans.media_queries import _afp_blobs

    got = {mid: fp for mid, _, fp in _afp_blobs()}
    md5s = {mid: hashlib.md5(b).hexdigest() for mid, b, _ in _afp_blobs()}
    assert got[1] == got[2] == got[3]
    assert len({md5s[1], md5s[2], md5s[3]}) == 3
    assert got[4] == got[5] and md5s[4] != md5s[5]
    assert len({got[1], got[4], got[6], got[7]}) == 4
    assert got[8] is None and got[9] is None


def test_audio_fingerprint_operator_matches_intent(spark):
    from hadoop_pcap_spark.operators.multimodal import audio_fingerprint
    from hadoop_pcap_spark.plans.media_queries import (
        _afp_blobs,
        afp_fixture_path,
    )

    want = {mid: fp for mid, _, fp in _afp_blobs()}
    got = {
        r["media_id"]: r["afp"]
        for r in audio_fingerprint(
            spark.read.parquet(afp_fixture_path())
        ).collect()
    }
    assert got == want


def test_video_scene_structure():
    """Scene families: within-scene dhash identical (lift-invariant),
    cross-scene hamming ≥ the cut threshold; the truncated trailing
    frame of video 3 is dropped by the chunk-walking splitter."""
    from hadoop_pcap_spark.plans.media_queries import (
        SCENE_CUT_HAMMING,
        _hamming_hex,
        _video_blobs,
    )

    vids = {m: frames for m, _, frames in _video_blobs()}
    h1 = [dh for _, dh in vids[1]]
    assert len(set(h1[:5])) == 1 and len(set(h1[5:9])) == 1
    assert _hamming_hex(h1[0], h1[5]) >= SCENE_CUT_HAMMING
    assert _hamming_hex(h1[5], h1[9]) >= SCENE_CUT_HAMMING
    assert len(vids[3]) == 2  # truncated 3rd frame not in truth


def test_split_png_frames_walks_chunks():
    """The splitter must walk chunk structure, not search for magic:
    a frame whose compressed pixels CONTAIN the PNG signature bytes
    still splits correctly."""
    import struct
    import zlib

    from hadoop_pcap_spark.operators.multimodal import split_png_frames

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    # craft an IDAT whose RAW bytes include the 8-byte PNG signature
    # (stored uncompressed via zlib level 0 so it survives deflate)
    w = h = 4
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += (b"\x89PNG\r\n\x1a\n" + bytes(12 * w))[: 3 * w]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    f = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(bytes(raw), 0))
         + chunk(b"IEND", b""))
    assert f.count(b"\x89PNG\r\n\x1a\n") >= 2  # signature inside IDAT
    frames = split_png_frames(f + f)
    assert len(frames) == 2 and frames[0] == f and frames[1] == f


def test_video_operator_matches_intent(spark):
    from hadoop_pcap_spark.operators.multimodal import video_frame_hashes
    from hadoop_pcap_spark.plans.media_queries import (
        _video_blobs,
        video_fixture_path,
    )

    want = {
        (m, no): dh for m, _, frames in _video_blobs() for no, dh in frames
    }
    got = {
        (r["media_id"], r["frame_no"]): r["dhash"]
        for r in video_frame_hashes(
            spark.read.parquet(video_fixture_path())
        ).collect()
    }
    assert got == want


def test_perceptual_hashes_null_on_zero_variance():
    """Flat inputs carry no texture/envelope signal: different solid
    colors (or silences) must NOT collapse into one destructive dedup
    group — the hash is NULL instead (r10 review finding)."""
    from hadoop_pcap_spark.operators.multimodal import (
        audio_fingerprint64,
        dhash64,
    )

    red = [b"\xff\x00\x00" * 24] * 16
    blue = [b"\x00\x00\xff" * 24] * 16
    assert dhash64(24, 16, red) is None
    assert dhash64(24, 16, blue) is None
    assert audio_fingerprint64(1, [0] * 500) is None      # silence
    assert audio_fingerprint64(1, [250] * 500) is None    # constant tone
    # near-flat but not flat still hashes
    assert audio_fingerprint64(1, [250] * 499 + [40000]) is not None
