"""Property checks for the SBM1/SVD1 media codec (pure numpy — no Spark,
so hypothesis can run many examples cheaply)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from hadoop_invertedindexer_spark.functions import media_codec

shapes = st.tuples(
    st.integers(1, 6),   # frames
    st.integers(1, 40),  # height
    st.integers(1, 40),  # width
    st.sampled_from([1, 3]),  # channels
)


@settings(max_examples=200, deadline=None)
@given(shape=shapes, seed=st.integers(0, 2**31 - 1))
def test_roundtrip_any_shape(shape, seed):
    rng = np.random.RandomState(seed % 2**31)
    pixels = rng.randint(0, 256, size=shape, dtype=np.uint8)
    decoded = media_codec.decode_media(media_codec.encode_media(pixels))
    np.testing.assert_array_equal(decoded, pixels)


@settings(max_examples=100, deadline=None)
@given(shape=shapes, w=st.integers(1, 50), h=st.integers(1, 50))
def test_resize_dims_and_value_domain(shape, w, h):
    pixels = np.arange(np.prod(shape), dtype=np.uint64).astype(np.uint8).reshape(shape)
    out = media_codec.resize_nearest(pixels, width=w, height=h)
    assert out.shape == (shape[0], h, w, shape[3])
    # nearest-neighbor only selects existing pixels — per-frame-channel
    # value sets must be subsets of the source's
    for f in range(shape[0]):
        for c in range(shape[3]):
            assert set(out[f, :, :, c].ravel()) <= set(pixels[f, :, :, c].ravel())


@settings(max_examples=100, deadline=None)
@given(
    doc_id=st.integers(0, 10**9),
    text=st.text(max_size=400),
)
def test_synth_payload_always_decodable_and_consistent(doc_id, text):
    payload = media_codec.synth_payload(doc_id, text)
    magic, width, height, channels, n_frames = media_codec.decode_header(payload)
    ew, eh, ec, ef = media_codec.synth_params(doc_id, len(text.encode("utf-8")))
    assert (width, height, channels, n_frames) == (ew, eh, ec, ef)
    assert magic == (
        media_codec.MAGIC_IMAGE if n_frames == 1 else media_codec.MAGIC_VIDEO
    )
    pixels = media_codec.decode_media(payload)
    # the raster is the text bytes cycled — spot-check the first bytes
    raw = text.encode("utf-8") or b"\x00"
    flat = pixels.ravel()
    head = min(len(raw), flat.size)
    np.testing.assert_array_equal(
        flat[:head], np.frombuffer(raw[:head], dtype=np.uint8)
    )


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(max_size=64))
def test_foreign_bytes_never_decode_silently(payload):
    """Arbitrary bytes must either raise ValueError or carry a valid
    magic+length header — decode_media never returns garbage silently."""
    try:
        pixels = media_codec.decode_media(payload)
    except ValueError:
        return
    assert payload[:4] in (media_codec.MAGIC_IMAGE, media_codec.MAGIC_VIDEO)
    assert pixels.size == len(payload) - media_codec.HEADER_LEN
