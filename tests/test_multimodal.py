"""Multimodal: the real SBM1/SVD1 codec path (decode/resize/frame-sample
over synthesized media), the foreign-codec ValueError gate, and the
fake-path plumbing for arbitrary binary payloads."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.utils import PythonException

from hadoop_invertedindexer_spark.functions import media_codec
from hadoop_invertedindexer_spark.operators import multimodal
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_binary_docs_schema(spark, sf_dir):
    b = multimodal.binary_docs(read_table(spark, sf_dir, "documents"))
    assert dict(b.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }


def test_fake_decode_values_deterministic(spark):
    docs = spark.createDataFrame([(7, "abcd")], ["doc_id", "text"])
    row = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=True).first()
    payload = b"abcd"
    assert row.doc_id == 7
    assert row.n_bytes == 4
    assert row.width == 16 + (len(payload) % 64)
    assert row.height == 16 + (sum(payload[:8]) % 64)
    assert row.n_frames == 1 + (len(payload) % 4)


def test_real_decode_rejects_foreign_codec(spark):
    # a text/plain payload is not SBM1/SVD1 — the real path must fail inside
    # the task the way a production decoder rejects an unknown codec
    docs = spark.createDataFrame([(1, "xyz plain text")], ["doc_id", "text"])
    df = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=False)
    with pytest.raises(PythonException, match="unsupported codec|too short"):
        df.collect()


# ---------------------------------------------------------- real codec path


def test_codec_roundtrip_exact():
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(3, 5, 4, 3), dtype=np.uint8)
    payload = media_codec.encode_media(pixels)
    assert payload[:4] == media_codec.MAGIC_VIDEO
    assert len(payload) == media_codec.HEADER_LEN + 3 * 5 * 4 * 3
    np.testing.assert_array_equal(media_codec.decode_media(payload), pixels)


def test_codec_rejects_corrupt_length():
    pixels = np.zeros((1, 2, 2, 1), dtype=np.uint8)
    payload = media_codec.encode_media(pixels)
    with pytest.raises(ValueError, match="corrupt payload"):
        media_codec.decode_media(payload + b"\x00")


def test_resize_nearest_known_values():
    # 1 frame, 2x2 gray checkerboard upscaled to 4x4 — each source pixel
    # becomes a 2x2 block under nearest-neighbor
    src = np.array([[[10], [20]], [[30], [40]]], dtype=np.uint8)[None, :, :, :]
    out = media_codec.resize_nearest(src, width=4, height=4)
    expect = np.array(
        [
            [10, 10, 20, 20],
            [10, 10, 20, 20],
            [30, 30, 40, 40],
            [30, 30, 40, 40],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(out[0, :, :, 0], expect)


def test_synthesize_and_real_decode_match_formulas(spark):
    docs = spark.createDataFrame(
        [(3, "hello world"), (5, "a video doc"), (10, "")], ["doc_id", "text"]
    )
    media = multimodal.synthesize_media(docs)
    rows = {
        r.doc_id: r
        for r in multimodal.decode_image_meta(media, fake=False).collect()
    }
    for doc_id, text in [(3, "hello world"), (5, "a video doc"), (10, "")]:
        nb = len(text.encode("utf-8"))
        w, h, c, frames = media_codec.synth_params(doc_id, nb)
        r = rows[doc_id]
        assert (r.width, r.height, r.n_frames) == (w, h, frames)
        assert r.n_bytes == media_codec.HEADER_LEN + frames * w * h * c
    # doc 5 and 10 are videos (doc_id % 5 == 0), doc 3 a still image
    media_types = {r.doc_id: r.media_type for r in media.collect()}
    assert media_types == {3: "image/sbm1", 5: "video/svd1", 10: "video/svd1"}


def test_real_resize_decodes_to_requested_dims(spark):
    docs = spark.createDataFrame([(5, "some video text")], ["doc_id", "text"])
    out = multimodal.resize_image(
        multimodal.synthesize_media(docs), width=6, height=3, fake=False
    ).first()
    pixels = media_codec.decode_media(bytes(out.payload))
    _, _, c, frames = media_codec.synth_params(5, len(b"some video text"))
    assert pixels.shape == (frames, 3, 6, c)


def test_real_frame_sample_roundtrips_frames(spark):
    docs = spark.createDataFrame([(5, "frame sample doc")], ["doc_id", "text"])
    media = multimodal.synthesize_media(docs)
    src = media_codec.decode_media(bytes(media.first().payload))
    frames = multimodal.frame_sample(media, every=2, fake=False).collect()
    assert [r.frame_idx for r in frames] == list(range(0, src.shape[0], 2))
    for r in frames:
        # each emitted frame is a standalone single-frame SBM1 container
        # whose pixels equal the source frame exactly
        decoded = media_codec.decode_media(bytes(r.frame))
        np.testing.assert_array_equal(decoded[0], src[r.frame_idx])


def test_feature_extract_decoded_pixels(spark):
    docs = spark.createDataFrame([(2, "ab")], ["doc_id", "text"])
    media = multimodal.synthesize_media(docs)
    row = multimodal.feature_extract(media, dim=8, decode=True).first()
    # oracle in numpy: histogram of decoded pixels mod 8, normalized
    pixels = media_codec.decode_media(bytes(media.first().payload)).ravel()
    hist = np.bincount(pixels % 8, minlength=8).astype("float64")
    np.testing.assert_allclose(row.features, hist / hist.sum(), atol=1e-6)


def test_resize_produces_requested_dimensions(spark):
    docs = spark.createDataFrame([(1, "x" * 100), (2, "y")], ["doc_id", "text"])
    out = multimodal.resize_image(
        multimodal.binary_docs(docs), width=8, height=4, fake=True
    ).collect()
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4 for r in out)


def test_frame_sample_fans_out(spark):
    docs = spark.createDataFrame([(1, "a" * 256)], ["doc_id", "text"])
    frames = multimodal.frame_sample(
        multimodal.binary_docs(docs), every=2, frame_bytes=32, fake=True
    ).collect()
    # 256 bytes / 32 = 8 frames, every 2nd -> indices 0,2,4,6
    assert [r.frame_idx for r in frames] == [0, 2, 4, 6]
    assert all(len(r.frame) == 32 for r in frames)


def test_feature_extract_schema_and_norm(spark):
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    row = multimodal.feature_extract(multimodal.binary_docs(docs), dim=8).first()
    assert len(row.features) == 8
    assert abs(sum(row.features) - 1.0) < 1e-6  # normalized histogram


def test_decode_matches_input_cardinality(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=True)
    assert decoded.count() == docs.count()


def _media_docs(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return multimodal.synthesize_media(docs)


def test_media_dedup_exact_groups_identical_payloads(spark):
    """Payloads are pure functions of (doc_id, text); the synthesis
    geometry is congruent for doc_ids 120 apart (120*7 % 24 == 0, same
    parity, same % 5 class), so same text + ids d and d+120 plant an
    exact payload dup."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    media = _media_docs(
        spark, [(7, txt), (127, txt), (8, txt), (9, "something else here")]
    )
    out = {r.keep_id: r.n_dups for r in multimodal.media_dedup_exact(media).collect()}
    assert out[7] == 2           # 7 and 127 collapse
    assert out[8] == 1           # same text, different geometry (id 8 vs 7)
    assert out[9] == 1


def test_media_ahash_identical_payloads_and_perturbation(spark):
    txt = "the quick brown fox jumps over the lazy dog again and again"
    near = txt.replace("quick brown", "zzzzz ZZZZZ")
    media = _media_docs(spark, [(7, txt), (127, txt), (247, near)])
    hashes = {r.doc_id: r.ahash for r in multimodal.media_ahash(media).collect()}
    assert hashes[7] == hashes[127]  # identical payloads -> identical hash
    # one-byte text change in a congruent raster: few sampled pixels move
    ham = bin((hashes[7] ^ hashes[247]) & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 16


def test_media_near_dup_pairs_finds_perceptual_dup(spark):
    txt = "the quick brown fox jumps over the lazy dog again and again"
    near = txt.replace("quick brown", "zzzzz ZZZZZ")
    media = _media_docs(
        spark,
        [(7, txt), (127, txt), (247, near), (9, "completely different words")],
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.media_near_dup_pairs(media, max_hamming=16).collect()
    }
    assert pairs[(7, 127)] == 0
    assert (7, 247) in pairs and pairs[(7, 247)] > 0
    assert all(9 not in p for p in pairs)


def test_media_ahash_matches_reference_formula(spark):
    """The mapInPandas hash must equal a straight-line recomputation from
    the codec geometry (the same arithmetic the SQL oracle uses)."""
    rows = [(1, "alpha beta gamma"), (5, "delta epsilon zeta eta"), (12, "")]
    media = _media_docs(spark, rows)
    got = {r.doc_id: r.ahash for r in multimodal.media_ahash(media).collect()}
    for doc_id, text in rows:
        raw = text.encode() or b"\x00"
        nb = len(raw)
        w, h, c, _ = media_codec.synth_params(doc_id, len(text.encode()))
        g = []
        for k in range(64):
            r_, c_ = ((k // 8) * h) // 8, ((k % 8) * w) // 8
            g.append(
                sum(raw[((r_ * w + c_) * c + ch) % nb] for ch in range(c))
            )
        s = sum(g)
        fp = 0
        for k in range(64):
            fp = (fp << 1) | (1 if 64 * g[k] > s else 0)
        expected = fp - (1 << 64) if fp >= (1 << 63) else fp
        assert got[doc_id] == expected, f"doc {doc_id}"


def test_pixel_histogram_counts_and_empty_text(spark):
    """Bin counts must equal numpy's over the decoded raster, including
    the empty-text edge (payload body = b'\\x00' cycled -> all pixels in
    bin 0)."""
    rows = [(1, "alpha beta gamma"), (12, "")]
    media = _media_docs(spark, rows)
    got = {r.doc_id: r.hist for r in multimodal.pixel_histogram(media).collect()}
    for doc_id, text in rows:
        px = media_codec.decode_media(
            media_codec.synth_payload(doc_id, text)
        ).ravel()
        expected = np.bincount(px % 16, minlength=16).tolist()
        assert got[doc_id] == expected, f"doc {doc_id}"
    w, h, c, fr = media_codec.synth_params(12, 0)
    assert got[12][0] == fr * w * h * c and sum(got[12][1:]) == 0


# ------------------------------------------------------------- audio


def test_audio_codec_roundtrip_exact():
    samples = (np.arange(12, dtype=np.int16).reshape(6, 2) - 6) * 1000
    payload = media_codec.encode_audio(samples, 16000)
    sr, back = media_codec.decode_audio(payload)
    assert sr == 16000 and back.shape == (6, 2)
    assert np.array_equal(back, samples)


def test_audio_codec_rejects_foreign_and_corrupt():
    with pytest.raises(ValueError, match="magic"):
        media_codec.decode_audio_header(b"RIFF" + b"\x00" * 20)
    good = media_codec.encode_audio(np.zeros((4, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="corrupt"):
        media_codec.decode_audio_header(good + b"\x00")


def test_audio_features_hand_computed(spark):
    """Mono payload with a known sign pattern: samples +1000, -1000,
    +1000, -1000 -> energy 4000, peak 1000, 3 zero crossings."""
    samples = np.array([[1000], [-1000], [1000], [-1000]], dtype=np.int16)
    payload = media_codec.encode_audio(samples, 8000)
    df = spark.createDataFrame([(1, bytearray(payload))], ["doc_id", "payload"])
    row = multimodal.audio_features(df).collect()[0]
    assert row.energy == 4000 and row.peak == 1000
    assert row.zero_crossings == 3
    assert row.duration_ms == 4 * 1000 // 8000


def test_audio_zero_crossings_per_channel_not_interleave(spark):
    """Stereo where the raw interleaved stream alternates sign every
    sample but each CHANNEL is constant-sign: crossings must be 0 —
    proving the stat is computed per channel, not over the interleave."""
    samples = np.tile(np.array([[1000, -1000]], dtype=np.int16), (5, 1))
    payload = media_codec.encode_audio(samples, 12000)
    df = spark.createDataFrame([(1, bytearray(payload))], ["doc_id", "payload"])
    assert multimodal.audio_features(df).collect()[0].zero_crossings == 0


def test_synthesize_audio_matches_formulas(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(20)
    meta = multimodal.decode_audio_meta(multimodal.synthesize_audio(docs))
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in meta.collect():
        nb = len(src[r.doc_id].encode("utf-8"))
        sr, ch, n = media_codec.synth_audio_params(r.doc_id, nb)
        assert (r.sample_rate, r.channels, r.n_samples) == (sr, ch, n)
        assert r.n_bytes == media_codec.AUDIO_HEADER_LEN + 2 * n * ch
