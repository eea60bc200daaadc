"""Multimodal column operators: the decode step is a deterministic stub
(no image/audio libs in this container) but the Spark plumbing — schema,
batch shape, partitioning, UDF signatures — is real and asserted here."""

import hashlib

import numpy as np
import pytest

from flink_ml__spark.functions.multimodal import (
    AudioFeatureExtractor,
    BinaryMetadataExtractor,
    FrameSampler,
    ImageDecoder,
    ImageResizer,
    ImageStats,
    fake_pixels,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 40
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 100
RAW = b"just some bytes, no magic"


def _df(spark):
    rows = [(1, bytearray(PNG)), (2, bytearray(JPG)), (3, bytearray(RAW))]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_metadata_extractor(spark):
    out = BinaryMetadataExtractor().transform(_df(spark))
    assert out.columns == ["id", "payload", "size_bytes", "content_md5",
                           "format"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "unknown"
    assert rows[1]["size_bytes"] == len(PNG)
    assert rows[3]["content_md5"] == hashlib.md5(RAW).hexdigest()


def test_image_decode_deterministic(spark):
    dec = ImageDecoder().setHeight(8).setWidth(8)
    out = dec.transform(_df(spark))
    assert out.columns == ["id", "payload", "height", "width", "pixels"]
    rows = {r["id"]: r for r in out.collect()}
    assert all(r["height"] == 8 and r["width"] == 8 and len(r["pixels"]) == 64
               for r in rows.values())
    # stub decode is a pure function of the payload bytes
    expected = fake_pixels(PNG, 8, 8).ravel().tolist()
    assert rows[1]["pixels"] == expected
    again = {r["id"]: r["pixels"]
             for r in dec.transform(_df(spark)).collect()}
    assert again == {i: r["pixels"] for i, r in rows.items()}


def test_image_resize_nearest_neighbor(spark):
    decoded = ImageDecoder().setHeight(8).setWidth(8).transform(_df(spark))
    out = ImageResizer().setTargetHeight(4).setTargetWidth(2) \
        .transform(decoded)
    rows = {r["id"]: r for r in out.collect()}
    assert all(r["height"] == 4 and r["width"] == 2 and len(r["pixels"]) == 8
               for r in rows.values())
    img = fake_pixels(PNG, 8, 8)
    yi, xi = (np.arange(4) * 8) // 4, (np.arange(2) * 8) // 2
    assert rows[1]["pixels"] == img[np.ix_(yi, xi)].ravel().tolist()


def test_image_stats(spark):
    decoded = ImageDecoder().setHeight(8).setWidth(8).transform(_df(spark))
    out = ImageStats().transform(decoded)
    r = {x["id"]: x for x in out.collect()}[1]
    px = fake_pixels(PNG, 8, 8).astype(float)
    assert r["px_mean"] == pytest.approx(px.mean())
    assert r["px_std"] == pytest.approx(px.std())
    assert (r["px_min"], r["px_max"]) == (int(px.min()), int(px.max()))


def test_frame_sampler(spark):
    out = (FrameSampler().setFrameBytes(16).setStride(2)
           .transform(_df(spark)))
    assert out.columns == ["id", "payload", "frame_index", "frame_mean"]
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["id"], []).append(r["frame_index"])
    # PNG payload = 48 bytes → 3 frames → indices 0, 2
    assert sorted(by_id[1]) == [0, 2]
    # RAW payload = 25 bytes → 1 frame → index 0
    assert by_id[3] == [0]


def test_audio_features(spark):
    out = AudioFeatureExtractor().setSampleCount(256).transform(_df(spark))
    rows = {r["id"]: r for r in out.collect()}
    for r in rows.values():
        assert 0.0 < r["rms"] < 1.0
        assert 0.0 <= r["zcr"] <= 1.0
        assert 0.0 < r["peak"] <= 1.0
    # deterministic across runs
    again = {r["id"]: r["rms"] for r in
             AudioFeatureExtractor().setSampleCount(256)
             .transform(_df(spark)).collect()}
    assert again == {i: r["rms"] for i, r in rows.items()}


def test_real_decoder_gated(spark):
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            ImageDecoder().setDecoder("pil").transform(_df(spark))
    with pytest.raises(ValueError):
        ImageDecoder().setDecoder("nonsense").transform(_df(spark))


def test_frame_sampler_null_payload(spark):
    """NULL payloads emit no frames (the oracle's WHERE predicate is
    NULL on NULL input — both engines must agree)."""
    from flink_ml__spark.functions.multimodal import FrameSampler

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 512)), (2, None)], ["id", "payload"])
    op = FrameSampler().setFrameBytes(256).setStride(1)
    rows = op.transform(df).collect()
    assert {r["id"] for r in rows} == {1}
    assert len(rows) == 2  # two frames from the real payload only


def test_real_decoder_dispatch_is_import_guarded(spark, monkeypatch):
    """decoder='pil'/'soundfile' must dispatch to the real library when
    importable and raise NotImplementedError when absent — never fall
    back to the stub. Dispatch only: the sandbox has neither library,
    so execution of the real branch stays untested here."""
    import sys
    import types

    import pytest as _pytest

    from flink_ml__spark.functions.multimodal import (
        AudioFeatureExtractor,
        FrameSampler,
        ImageDecoder,
    )

    df = spark.createDataFrame([(1, bytearray(b"payload"))],
                               ["id", "payload"])

    # libraries absent (the sandbox state): plan build fails fast
    with _pytest.raises(NotImplementedError, match="PIL"):
        ImageDecoder().setDecoder("pil").transform(df)
    with _pytest.raises(NotImplementedError, match="soundfile"):
        AudioFeatureExtractor().setDecoder("soundfile").transform(df)
    with _pytest.raises(NotImplementedError, match="av"):
        FrameSampler().setDecoder("pyav").transform(df)
    # unknown decoder name is a usage error, not a missing library
    with _pytest.raises(ValueError, match="unknown decoder"):
        ImageDecoder().setDecoder("webp").transform(df)
    with _pytest.raises(ValueError, match="unknown decoder"):
        FrameSampler().setDecoder("pil").transform(df)

    # fake PIL importable → dispatch succeeds at plan-build time
    pil_pkg = types.ModuleType("PIL")
    pil_img = types.ModuleType("PIL.Image")
    pil_img.open = lambda *_: None
    pil_pkg.Image = pil_img
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_img)
    out = ImageDecoder().setDecoder("pil").transform(df)
    assert "pixels" in out.columns

    sf_mod = types.ModuleType("soundfile")
    sf_mod.read = lambda *_, **__: (None, 0)
    monkeypatch.setitem(sys.modules, "soundfile", sf_mod)
    out = AudioFeatureExtractor().setDecoder("soundfile").transform(df)
    assert "rms" in out.columns

    av_mod = types.ModuleType("av")
    av_mod.open = lambda *_, **__: None
    monkeypatch.setitem(sys.modules, "av", av_mod)
    out = FrameSampler().setDecoder("pyav").transform(df)
    assert "frame_mean" in out.columns


def test_image_stats_and_resize_null_pixels_propagate(spark):
    """The real decoder's NULL-payload contract emits NULL pixels;
    stats/resize must propagate NULLs instead of crashing the batch."""
    from flink_ml__spark.functions.multimodal import ImageResizer, ImageStats

    df = spark.createDataFrame(
        [(1, 2, 2, [0, 50, 100, 150]), (2, 2, 2, None)],
        "doc_id long, height int, width int, pixels array<int>")
    stats = {r["doc_id"]: r for r in ImageStats().transform(df).collect()}
    assert stats[1]["px_mean"] == 75.0 and stats[1]["px_max"] == 150
    assert stats[2]["px_mean"] is None and stats[2]["px_min"] is None

    resized = {r["doc_id"]: r for r in
               (ImageResizer().setTargetHeight(1).setTargetWidth(1)
                .transform(df)).collect()}
    assert resized[1]["pixels"] == [0]
    assert resized[2]["pixels"] is None


def test_image_decoder_regenerates_columns_without_duplicates(spark):
    """Re-decoding a frame that already carries height/width/pixels
    must not produce a duplicate-name schema."""
    from flink_ml__spark.functions.multimodal import ImageDecoder

    df = spark.createDataFrame([(1, bytearray(b"abc"), 9, 9, [1])],
                               "doc_id long, payload binary, height int, "
                               "width int, pixels array<int>")
    out = (ImageDecoder().setBinaryCol("payload").setHeight(2)
           .setWidth(2).transform(df))
    assert [f.name for f in out.schema.fields].count("height") == 1
    row = out.first()
    assert row["height"] == 2 and len(row["pixels"]) == 4


def test_scene_change_detector_lag_and_threshold(spark):
    from flink_ml__spark.functions.multimodal import SceneChangeDetector

    frames = spark.createDataFrame(
        [(1, 0, 100.0), (1, 2, 103.0), (1, 4, 120.0), (1, 6, 120.0),
         (2, 0, 50.0)],
        "doc_id long, frame_index int, frame_mean double")
    out = (SceneChangeDetector().setThreshold(8.0).transform(frames)
           .orderBy("doc_id", "frame_index").collect())
    # first frame of each video: NULL delta, always a scene start
    assert out[0]["mean_delta"] is None and out[0]["is_scene_change"]
    assert out[4]["mean_delta"] is None and out[4]["is_scene_change"]
    # small delta: no cut; big delta: cut; zero delta: no cut
    assert out[1]["mean_delta"] == 3.0 and not out[1]["is_scene_change"]
    assert out[2]["mean_delta"] == 17.0 and out[2]["is_scene_change"]
    assert out[3]["mean_delta"] == 0.0 and not out[3]["is_scene_change"]


def test_scene_change_detector_custom_columns(spark):
    from flink_ml__spark.functions.multimodal import SceneChangeDetector

    frames = spark.createDataFrame(
        [("v1", 1, 0.0), ("v1", 2, 9.0)],
        "vid string, idx int, energy double")
    op = (SceneChangeDetector().setIdCol("vid").setFrameIndexCol("idx")
          .setValueCol("energy").setThreshold(5.0))
    got = op.transform(frames).orderBy("idx").collect()
    assert [r["is_scene_change"] for r in got] == [True, True]
    assert got[1]["mean_delta"] == 9.0


# ------------------------------------------------------- perceptual hash

def _decoded(spark, payloads):
    from flink_ml__spark.functions.multimodal import ImageDecoder

    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    return ImageDecoder().setHeight(16).setWidth(16).transform(df)


def test_dhash_matches_pure_python(spark):
    from flink_ml__spark.functions.multimodal import (
        PerceptualImageHasher,
        fake_pixels,
    )

    payloads = [(1, b"hello world"), (2, b"another image"), (3, None)]
    out = {r["doc_id"]: r for r in
           PerceptualImageHasher().transform(_decoded(spark, payloads))
           .collect()}

    import numpy as np
    for doc_id, payload in payloads[:2]:
        img = fake_pixels(payload, 16, 16)
        yi = (np.arange(8) * 16) // 8
        xi = (np.arange(9) * 16) // 9
        small = img[np.ix_(yi, xi)]
        bits = (small[:, :-1] > small[:, 1:]).ravel()
        bands = [int(sum(int(b) << (15 - i)
                         for i, b in enumerate(bits[k * 16:(k + 1) * 16])))
                 for k in range(4)]
        want_hex = "".join(f"{v:04x}" for v in bands)
        r = out[doc_id]
        assert r["dhash_hex"] == want_hex
        assert [r[f"dhash_b{k}"] for k in range(4)] == bands
    # NULL payload decodes to the keystream of b"" under the stub —
    # but a NULL pixels row (real decoder) must map to NULL hash
    assert out[3]["dhash_hex"] is not None  # stub decodes empty bytes


def test_dhash_null_pixels_passthrough(spark):
    import pandas as pd

    from flink_ml__spark.functions.multimodal import PerceptualImageHasher

    df = spark.createDataFrame(
        [(1, 16, 16, None)],
        "doc_id long, height int, width int, pixels array<int>")
    r = PerceptualImageHasher().transform(df).first()
    assert r["dhash_hex"] is None and r["dhash_b0"] is None


def test_dhash_duplicate_pairs(spark):
    from flink_ml__spark.functions.multimodal import PerceptualImageHasher

    # 1 and 2 share a payload (exact dup, hamming 0); 3 is different
    payloads = [(1, b"same bytes"), (2, b"same bytes"), (3, b"other")]
    hashed = PerceptualImageHasher().transform(_decoded(spark, payloads))
    pairs = (PerceptualImageHasher()
             .duplicate_pairs(hashed, "doc_id", max_distance=0)
             .collect())
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == \
        [(1, 2, 0)]


def test_dhash_near_dup_within_distance(spark):
    import numpy as np

    from flink_ml__spark.functions.multimodal import PerceptualImageHasher

    # hand-built decoded rows: identical image vs one flipped dhash bit
    base = np.arange(256).reshape(16, 16) % 191
    tweaked = base.copy()
    # flip the comparison at resized cell (0,0)-(0,1): raise one pixel
    tweaked[0, 0] = 190
    rows = [(1, 16, 16, base.ravel().tolist()),
            (2, 16, 16, tweaked.ravel().tolist())]
    df = spark.createDataFrame(
        rows, "doc_id long, height int, width int, pixels array<int>")
    hashed = PerceptualImageHasher().transform(df)
    pairs = (PerceptualImageHasher()
             .duplicate_pairs(hashed, "doc_id", max_distance=3)
             .collect())
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        PerceptualImageHasher().duplicate_pairs(hashed, "doc_id", 4)


# ------------------------------------------------- real-bytes end-to-end

def _wav_bytes(samples, framerate=8000, nch=1):
    """Genuine RIFF/WAVE PCM16 bytes via the stdlib writer."""
    import io
    import wave

    pcm = np.round(np.clip(np.asarray(samples), -1, 1)
                   * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _pgm_bytes(img):
    """Genuine binary PGM (P5) bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    return b"P5\n# real netpbm fixture\n%d %d\n255\n" % (w, h) \
        + img.tobytes()


def test_real_wav_end_to_end(spark):
    """decoder='wav': REAL RIFF PCM bytes through the full Spark path —
    features must match numpy ground truth on the source signal."""
    t = np.arange(800) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    quiet = 0.05 * np.sin(2 * np.pi * 100 * t)
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(sine))),
         (2, bytearray(_wav_bytes(quiet))),
         (3, None)],
        "id long, payload binary")
    out = {r["id"]: r for r in (AudioFeatureExtractor().setDecoder("wav")
                                .transform(df).collect())}
    for i, sig in ((1, sine), (2, quiet)):
        q = np.round(np.clip(sig, -1, 1) * 32767) / 32768.0
        assert abs(out[i]["rms"] - np.sqrt((q * q).mean())) < 1e-9
        assert abs(out[i]["peak"] - np.abs(q).max()) < 1e-9
        zcr = (np.diff(np.signbit(q)) != 0).mean()
        assert abs(out[i]["zcr"] - zcr) < 1e-9
    assert out[3]["rms"] is None and out[3]["peak"] is None


def test_real_wav_stereo_mono_fold(spark):
    """Stereo REAL WAV folds channels to their mean before features."""
    left = 0.5 * np.ones(100)
    right = -0.5 * np.ones(100)
    inter = np.empty(200)
    inter[0::2], inter[1::2] = left, right
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(inter, nch=2)))], "id long, payload binary")
    r = (AudioFeatureExtractor().setDecoder("wav")
         .transform(df).first())
    # (0.5 + -0.5)/2 = ~0 after int16 quantization (off by <= 1 LSB)
    assert abs(r["rms"]) < 1e-4 and abs(r["peak"]) < 1e-4


def test_real_ppm_decode_stats_dhash_end_to_end(spark):
    """decoder='ppm': REAL binary netpbm bytes → decode → stats →
    perceptual dhash, all through Spark. A decreasing horizontal
    gradient dhashes to all-ones (bit = left brighter than right) and a
    constant image to all-zeros; stats match numpy on the source."""
    from flink_ml__spark.functions.multimodal import (
        PerceptualImageHasher,
    )

    grad = np.tile(np.linspace(255, 0, 32).astype(np.uint8), (24, 1))
    flat = np.full((24, 32), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_pgm_bytes(grad))),
         (2, bytearray(_pgm_bytes(flat))),
         (3, None)],
        "doc_id long, payload binary")
    dec = (ImageDecoder().setDecoder("ppm").setHeight(16).setWidth(16)
           .transform(df))
    stats = {r["doc_id"]: r for r in ImageStats().transform(dec).collect()}
    # nearest-resize of a horizontal gradient keeps column values
    cols = np.minimum((np.arange(16) + 0.5) * 32 / 16, 31).astype(int)
    want = np.tile(grad[0][cols], (16, 1)).astype(np.float64)
    assert abs(stats[1]["px_mean"] - want.mean()) < 1e-9
    assert stats[1]["px_min"] == int(want.min())
    assert stats[1]["px_max"] == int(want.max())
    assert stats[2]["px_mean"] == 7.0 and stats[2]["px_std"] == 0.0
    assert stats[3]["px_mean"] is None

    hashed = {r["doc_id"]: r["dhash_hex"]
              for r in PerceptualImageHasher().transform(dec).collect()}
    assert hashed[1] == "f" * 16   # strictly decreasing rows
    assert hashed[2] == "0" * 16   # constant image
    assert hashed[3] is None


def test_real_ppm_p6_rgb_luma_matches_pil_weights(spark):
    """P6 RGB payloads fold to grayscale with ITU-R 601-2 integer luma
    — the same weights PIL's convert('L') applies."""
    from flink_ml__spark.functions.multimodal import decode_ppm_bytes

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 200  # red
    rgb[0, 0] = (10, 200, 90)
    payload = b"P6\n2 2\n255\n" + rgb.tobytes()
    img = decode_ppm_bytes(payload)
    lum = (rgb[..., 0].astype(int) * 299 + rgb[..., 1].astype(int) * 587
           + rgb[..., 2].astype(int) * 114) // 1000
    assert (img == lum).all()


def test_real_wav_rejects_non_pcm():
    from flink_ml__spark.functions.multimodal import decode_wav_bytes

    with pytest.raises(Exception):
        decode_wav_bytes(b"RIFFnot really a wav")


def test_real_jpeg_via_pil_when_available(spark):
    """Full real-JPEG path where Pillow exists (skipped otherwise):
    encode a gradient to actual JPEG bytes, decode with decoder='pil',
    and confirm stats/dhash land near the source image."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from flink_ml__spark.functions.multimodal import (
        PerceptualImageHasher,
    )

    grad = np.tile(np.linspace(255, 0, 64).astype(np.uint8), (48, 1))
    buf = io.BytesIO()
    PIL.fromarray(grad, mode="L").save(buf, format="JPEG", quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    dec = (ImageDecoder().setDecoder("pil").setHeight(16).setWidth(16)
           .transform(df))
    s = ImageStats().transform(dec).first()
    assert abs(s["px_mean"] - grad.mean()) < 8     # JPEG is lossy
    h = PerceptualImageHasher().transform(dec).first()
    assert h["dhash_hex"] == "f" * 16              # gradient survives


def test_real_flac_via_soundfile_when_available(spark):
    """Real soundfile branch where libsndfile exists (skipped
    otherwise)."""
    sf_mod = pytest.importorskip("soundfile")
    import io

    sig = 0.25 * np.sin(2 * np.pi * 220 * np.arange(400) / 8000.0)
    buf = io.BytesIO()
    sf_mod.write(buf, sig, 8000, format="WAV", subtype="PCM_16")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "id long, payload binary")
    r = (AudioFeatureExtractor().setDecoder("soundfile")
         .transform(df).first())
    assert abs(r["rms"] - np.sqrt((sig * sig).mean())) < 1e-3


def test_average_hash_known_patterns(spark):
    from flink_ml__spark.functions.multimodal import AverageImageHasher

    # 8x8 inputs used as-is by the resize grid
    bright_half = np.zeros((8, 8), dtype=np.uint8)
    bright_half[:4, :] = 200          # top half above mean
    const = np.full((8, 8), 9, dtype=np.uint8)
    rows = [
        (1, 8, 8, [int(x) for x in bright_half.ravel()]),
        (2, 8, 8, [int(x) for x in const.ravel()]),
        (3, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, height int, width int, pixels array<int>")
    got = {r["doc_id"]: r
           for r in AverageImageHasher().transform(df).collect()}
    assert got[1]["ahash_hex"] == "ffffffff00000000"
    # constant image: 64*px == sum exactly -> strict > is false
    assert got[2]["ahash_hex"] == "0" * 16
    assert got[3]["ahash_hex"] is None and got[3]["ahash_b2"] is None


def test_average_hash_matches_dhash_grid_convention(spark):
    from flink_ml__spark.functions.multimodal import (
        AverageImageHasher,
        ImageDecoder,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"payload-a")), (2, bytearray(b"payload-a")),
         (3, bytearray(b"payload-b"))],
        "doc_id long, payload binary")
    dec = ImageDecoder().setHeight(16).setWidth(16).transform(df)
    got = {r["doc_id"]: r["ahash_hex"]
           for r in AverageImageHasher().transform(dec).collect()}
    assert got[1] == got[2]           # identical bytes, identical hash
    assert got[1] != got[3]


# ---------------------------------------------------------------------------
# AudioSilenceDetector
# ---------------------------------------------------------------------------

def _silence_wav_bytes(samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(
            struct.pack("<h", int(s * 32767)) for s in samples))
    return buf.getvalue()


def test_audio_silence_real_wav_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.multimodal import AudioSilenceDetector
    # 2 silent windows, then 2 loud windows (window = 64 samples)
    samples = [0.0] * 128 + [0.9 if i % 2 == 0 else -0.9
                             for i in range(128)]
    df = spark.createDataFrame(
        [(1, bytearray(_silence_wav_bytes(samples))), (2, None)],
        "doc_id long, payload binary")
    r = {x["doc_id"]: x for x in
         (AudioSilenceDetector().setDecoder("wav").setWindowSize(64)
          .setThreshold(0.5).setBinaryCol("payload")
          .transform(df).collect())}
    assert r[1]["n_windows"] == 4 and r[1]["n_silent"] == 2
    assert abs(r[1]["silence_frac"] - 0.5) < 1e-12
    assert r[1]["n_silent_runs"] == 1 and r[1]["lead_trim"] == 2
    assert r[2]["n_windows"] is None
    # interleaved silence: two separate runs, no leading silence
    s2 = ([0.9, -0.9] * 32 + [0.0] * 64) * 2
    df2 = spark.createDataFrame(
        [(1, bytearray(_silence_wav_bytes(s2)))], "doc_id long, payload binary")
    r = (AudioSilenceDetector().setDecoder("wav").setWindowSize(64)
         .setThreshold(0.5).setBinaryCol("payload")
         .transform(df2).first())
    assert r["n_silent_runs"] == 2 and r["lead_trim"] == 0
    with _pt.raises(ValueError, match="windowSize"):
        AudioSilenceDetector().setWindowSize(0)


def test_audio_silence_fake_deterministic(spark):
    from flink_ml__spark.functions.multimodal import AudioSilenceDetector
    df = spark.createDataFrame(
        [(i, bytearray(f"payload-{i}".encode())) for i in range(4)],
        "doc_id long, payload binary")
    op = (AudioSilenceDetector().setDecoder("fake").setSampleCount(256)
          .setWindowSize(64).setThreshold(0.6).setBinaryCol("payload"))
    a = sorted(tuple(r) for r in op.transform(df).collect())
    b = sorted(tuple(r) for r in op.transform(df).collect())
    assert a == b            # keystream decode is deterministic
    rows = {r["doc_id"]: r for r in op.transform(df).collect()}
    assert all(r["n_windows"] == 4 for r in rows.values())
    # uniform fake PCM has window RMS near 0.577: a 0.5 threshold
    # flags nothing, and raising it can only add silent windows
    lo = (AudioSilenceDetector().setDecoder("fake").setSampleCount(256)
          .setWindowSize(64).setThreshold(0.5).setBinaryCol("payload"))
    lo_rows = {r["doc_id"]: r for r in lo.transform(df).collect()}
    assert all(r["n_silent"] == 0 for r in lo_rows.values())
    assert all(rows[k]["n_silent"] >= lo_rows[k]["n_silent"]
               for k in rows)
