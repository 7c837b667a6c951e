"""Property-based tests (hypothesis) for the r12 media operators —
thumbnail, audio resample, and the ISO BMFF container round-trip.

The invariants here are the ones the oracle fixtures depend on: exact
determinism (a generation-time stamp must equal any later re-derivation
on any platform), area-average boundedness (an average can never leave
the range of its inputs), and encoder↔parser agreement for every legal
(payload, duration) pair — not just the fixture corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_examples_spark.operators.media import (
    DecodedAudio,
    DecodedImage,
    parse_mp4,
    pcm_checksum,
    pixel_checksum,
    resample_audio,
    thumbnail,
    thumbnail_dims,
)
from tools.media_encoders import mp4_encode


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    px = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return DecodedImage(w, h, px)


@settings(max_examples=60, deadline=None)
@given(images(), st.integers(min_value=1, max_value=20))
def test_thumbnail_bounded_and_deterministic(img, box):
    th = thumbnail(img, box)
    tw, thh = thumbnail_dims(img.width, img.height, box)
    assert (th.width, th.height) == (tw, thh)
    assert 1 <= th.width <= box and 1 <= th.height <= box
    assert max(th.width, th.height) == box
    assert len(th.pixels) == th.width * th.height * 3
    # an area average never leaves the per-channel input range
    # (+1 headroom for the half-up rounding at the top end)
    for c in range(3):
        src = img.pixels[c::3]
        out = th.pixels[c::3]
        assert min(out) >= min(src)
        assert max(out) <= min(255, max(src) + 1)
    # bit-determinism: same pixels, same thumbnail, same checksum
    again = thumbnail(DecodedImage(img.width, img.height, img.pixels), box)
    assert again.pixels == th.pixels
    assert pixel_checksum(again) == pixel_checksum(th)


@settings(max_examples=60, deadline=None)
@given(images())
def test_thumbnail_uniform_image_stays_uniform(img):
    r, g, b = img.pixels[0], img.pixels[1], img.pixels[2]
    flat = DecodedImage(
        img.width, img.height, bytes([r, g, b]) * (img.width * img.height)
    )
    th = thumbnail(flat, 16)
    assert set(th.pixels[0::3]) == {r}
    assert set(th.pixels[1::3]) == {g}
    assert set(th.pixels[2::3]) == {b}


@st.composite
def audios(draw):
    nch = draw(st.integers(min_value=1, max_value=2))
    frames = draw(st.integers(min_value=1, max_value=400))
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    samples = draw(
        st.lists(
            st.integers(min_value=-(1 << 15), max_value=(1 << 15) - 1),
            min_size=frames * nch,
            max_size=frames * nch,
        )
    )
    return DecodedAudio(rate, nch, 16, tuple(samples))


@settings(max_examples=60, deadline=None)
@given(audios(), st.sampled_from([4000, 8000, 16000]))
def test_resample_bounded_shape_and_determinism(audio, out_rate):
    rs = resample_audio(audio, out_rate)
    assert rs.n_channels == audio.n_channels
    assert rs.sample_rate == out_rate
    in_frames = len(audio.samples) // audio.n_channels
    if out_rate == audio.sample_rate:
        assert rs.samples == audio.samples
    else:
        exp_frames = max(1, in_frames * out_rate // audio.sample_rate)
        assert len(rs.samples) == exp_frames * audio.n_channels
    # per-channel boundedness (+/-1 headroom for half-up rounding)
    for c in range(audio.n_channels):
        src = audio.samples[c :: audio.n_channels]
        out = rs.samples[c :: rs.n_channels]
        assert min(out) >= min(src) - 1
        assert max(out) <= max(src) + 1
    # determinism: stamp-vs-recompute equality is the oracle contract
    again = resample_audio(audio, out_rate)
    assert again.samples == rs.samples
    assert pcm_checksum(again) == pcm_checksum(rs)


@settings(max_examples=60, deadline=None)
@given(audios())
def test_resample_constant_signal_stays_constant(audio):
    v = audio.samples[0]
    const = DecodedAudio(
        audio.sample_rate,
        1,
        16,
        tuple([v] * (len(audio.samples) // audio.n_channels)),
    )
    rs = resample_audio(const, 4000)
    assert set(rs.samples) == {v}


@settings(max_examples=80, deadline=None)
@given(
    st.binary(min_size=0, max_size=4096),
    st.integers(min_value=0, max_value=(1 << 32) - 1),
)
def test_mp4_roundtrip_over_arbitrary_payloads(mdat, duration_ms):
    info = parse_mp4(mp4_encode(mdat, duration_ms))
    assert info.duration_ms == duration_ms
    assert info.n_tracks == 1
    assert info.handlers == ("vide",)
    assert info.mdat_bytes == len(mdat)
