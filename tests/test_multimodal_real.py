"""Real multimodal codecs (pure numpy/struct BMP/PPM/WAV), perceptual
hashes, and the pHash banded-Hamming image dedup pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from logjuicer_ray.functions.multimodal import (
    audio_fp64,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    phash64,
)


def _rand_img(rng, h=37, w=53):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    for h, w in [(37, 53), (16, 16), (1, 1), (5, 2)]:  # incl. padded rows
        img = _rand_img(rng, h, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" * 10)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(np.zeros((4, 4, 3), np.uint8))[:40])


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(2)
    img = _rand_img(rng)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment tolerated in header
    buf = encode_ppm(img)
    commented = b"P6\n# a comment\n" + buf[3:]
    assert np.array_equal(decode_ppm(commented), img)


def test_wav_roundtrip_and_chunk_walk():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, 4321).astype(np.int16)
    s, r = decode_wav(encode_wav(pcm, 8000))
    assert r == 8000 and np.array_equal(s, pcm)
    # stereo / non-PCM rejected
    import struct

    bad = bytearray(encode_wav(pcm, 8000))
    struct.pack_into("<H", bad, 22, 2)  # channels = 2
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_phash_noise_invariance_and_discrimination():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 48, 48)
    noisy = np.clip(
        img.astype(int) + rng.integers(-6, 7, img.shape), 0, 255
    ).astype(np.uint8)
    other = _rand_img(rng, 48, 48)

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert phash64(img) == phash64(img.copy())
    assert ham(phash64(img), phash64(noisy)) <= 8
    assert ham(phash64(img), phash64(other)) > 12


def test_audio_fp_deterministic_and_short_zero():
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32767, 4000).astype(np.int16)
    assert audio_fp64(pcm) == audio_fp64(pcm.copy())
    assert audio_fp64(np.zeros(64, np.int16)) == 0


def test_real_stage_features_and_stable_schema(ray_session):
    """bmp/wav rows get real features + non-null hash columns; fake
    formats stay on the stub path with nulls — one stable schema."""
    import ray.data as rd

    from logjuicer_ray.functions.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        synth_media_batch,
        synth_real_media_batch,
    )

    real = synth_real_media_batch(list(range(8)))
    fake = synth_media_batch(list(range(100, 108)))
    mixed = pa.concat_tables([real, fake])
    imgs = mixed.filter(
        __import__("pyarrow").compute.equal(mixed.column("kind"), "image")
    )
    out = ImageDecodeStage()(imgs)
    d = dict(zip(out.column("media_id").to_pylist(),
                 out.column("phash").to_pylist()))
    for mid, fmt in zip(imgs.column("media_id").to_pylist(),
                        imgs.column("format").to_pylist()):
        assert (d[mid] is not None) == (fmt in ("bmp", "png")), (mid, fmt)
    auds = mixed.filter(
        __import__("pyarrow").compute.equal(mixed.column("kind"), "audio")
    )
    aout = AudioFeatureStage()(auds)
    fd = dict(zip(aout.column("media_id").to_pylist(),
                  aout.column("audio_fp").to_pylist()))
    for mid, fmt in zip(auds.column("media_id").to_pylist(),
                        auds.column("format").to_pylist()):
        assert (fd[mid] is not None) == (fmt == "wav"), (mid, fmt)
    # real wav features: duration = n/rate in [0.128, 0.512]
    durs = [v[0] for mid, v in zip(aout.column("media_id").to_pylist(),
                                   aout.column("audio_features").to_pylist())
            if fd[mid] is not None]
    assert all(0.1 < d_ < 0.6 for d_ in durs)
    # strict still raises on the fake formats only
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(imgs)
    real_imgs = real.filter(
        __import__("pyarrow").compute.equal(real.column("kind"), "image")
    )
    ImageDecodeStage(strict=True)(real_imgs)  # no raise: all bmp


def test_phash_dedup_plants_near_and_exact_dups(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.multimodal import (
        phash_dedup,
        synth_real_media_batch,
    )

    t = synth_real_media_batch(list(range(0, 40, 2)))  # 20 png/bmp images
    img0 = decode_image(t.column("payload")[0].as_py())  # id 0 is a PNG
    rng = np.random.default_rng(5)
    noisy = np.clip(
        img0.astype(int) + rng.integers(-4, 5, img0.shape), 0, 255
    ).astype(np.uint8)
    extra = pa.table({
        "media_id": pa.array([1000, 1001], pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([encode_bmp(noisy), encode_bmp(img0)], pa.binary()),
        "format": pa.array(["bmp", "bmp"]),
        "width": pa.array([img0.shape[1]] * 2, pa.int32()),
        "height": pa.array([img0.shape[0]] * 2, pa.int32()),
        "sample_rate": pa.array([0, 0], pa.int32()),
    })
    full = pa.concat_tables([t, extra])
    for parts in (1, 3):
        out = phash_dedup(
            rd.from_arrow(full).repartition(parts)
        ).to_pandas().set_index("media_id")["dup_of"]
        # exact copy AND ±4-noise copy both cluster under root 0
        assert out.loc[1001] == 0
        assert out.loc[1000] == 0


def test_audio_dedup_media_query(ray_session):
    """The registered audio near-dup query: planted exact duplicate of
    audio 1 clusters under root 1, and output is deterministic."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    df = e.queries()["audio_dedup_media"]("/root/testdata/sf0.001").to_pandas()
    assert df.set_index("media_id")["dup_of"].get(100001) == 1
    df2 = e.queries()["audio_dedup_media"]("/root/testdata/sf0.001").to_pandas()
    assert df.equals(df2)


def test_phash_dedup_media_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    df = e.queries()["phash_dedup_media"]("/root/testdata/sf0.001").to_pandas()
    d = df.set_index("media_id")["dup_of"]
    assert d.get(100000) == 0 and d.get(100001) == 0


def test_framepack_roundtrip_and_seek_sampling():
    from logjuicer_ray.functions.multimodal import (
        decode_framepack_index,
        encode_framepack,
        sample_framepack,
    )

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(12)]
    buf = encode_framepack(frames, fps=6)
    n, fps, idx = decode_framepack_index(buf)
    assert (n, fps, len(idx)) == (12, 6, 12)
    samp = sample_framepack(buf, every=5)
    assert len(samp) == 3  # frames 0, 5, 10
    for got, want in zip(samp, [frames[0], frames[5], frames[10]]):
        assert np.array_equal(got, want)
    with pytest.raises(ValueError):
        decode_framepack_index(b"NOPE" + buf[4:])


def test_video_frames_media_query(ray_session):
    """Registered video query: planted duplicate clip has identical
    sampled-frame features; strict stage raises only on non-fpk."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    from logjuicer_ray.functions.multimodal import (
        VideoFrameSampleStage,
        synth_media_batch,
        synth_video_batch,
    )

    df = e.queries()["video_frames_media"]("/root/testdata/sf0.001").to_pandas()
    d = df.set_index("media_id")
    assert (d.loc[100000] == d.loc[0]).all()
    # full fingerprint equality, not just the head columns
    vids = synth_video_batch([0, 3, 100000], dup_of={100000: 0})
    out = VideoFrameSampleStage()(vids)
    fp = dict(zip(out.column("media_id").to_pylist(),
                  out.column("frame_phashes").to_pylist()))
    assert fp[100000] == fp[0] and fp[3] != fp[0]
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True)(synth_media_batch([2]))


def test_hash64_bands_pigeonhole_guarantee(ray_session):
    """Signatures within Hamming distance < 64/band_bits are GUARANTEED
    to share at least one band bucket (the LSH recall floor the media
    dedup paths rely on) — randomized over 500 planted pairs."""
    import ray.data as rd

    from logjuicer_ray.functions.dedup import hash64_bands

    rng = np.random.default_rng(17)
    base = rng.integers(-2**63, 2**63 - 1, 500, dtype=np.int64)
    flipped = base.copy()
    for i in range(500):
        bits = rng.choice(64, size=rng.integers(0, 4), replace=False)
        for b in bits:
            flipped[i] = np.int64(
                np.uint64(flipped[i]) ^ np.uint64(1 << int(b))
            )
    t = pa.table({
        "id": pa.array(np.arange(1000), pa.int64()),
        "h": pa.array(np.concatenate([base, flipped]), pa.int64()),
    })
    bands = hash64_bands(
        rd.from_arrow(t), id_col="id", hash_col="h", band_bits=16
    ).to_pandas()
    by_id = bands.groupby("id").apply(
        lambda g: set(zip(g["band"], g["band_hash"])), include_groups=False
    )
    for i in range(500):
        assert by_id[i] & by_id[500 + i], f"pair {i} shares no band"


# --- hypothesis property tests for the real codecs ------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_png_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_ppm_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=30, deadline=None)
@given(n=st.integers(0, 5000), rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, rate, seed):
    pcm = np.random.default_rng(seed).integers(
        -32768, 32768, n
    ).astype(np.int16)
    s, r = decode_wav(encode_wav(pcm, rate))
    assert r == rate and np.array_equal(s, pcm)


def test_hash64_hamming_filter_exact_vs_bruteforce(ray_session):
    """The broadcast-lookup exact Hamming verifier matches a driver brute
    force (XOR + popcount) on random candidate pairs."""
    import ray.data as rd

    from logjuicer_ray.functions.dedup import hash64_hamming_filter

    rng = np.random.default_rng(3)
    n = 500
    hs = rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64)
    sigs = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "h": pa.array(hs, pa.int64()),
    }))
    a_ids = rng.integers(0, n, 200)
    b_ids = rng.integers(0, n, 200)
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(a_ids, pa.int64()),
        "b": pa.array(b_ids, pa.int64()),
    }))
    out = hash64_hamming_filter(
        pairs, sigs, id_col="id", hash_col="h", max_hamming=24
    ).to_pandas()

    def ham(x, y):
        return bin((int(x) ^ int(y)) & 0xFFFFFFFFFFFFFFFF).count("1")

    want = sorted(
        (int(x), int(y), ham(hs[x], hs[y]))
        for x, y in zip(a_ids, b_ids) if ham(hs[x], hs[y]) <= 24
    )
    got = sorted(zip(out["a"], out["b"], out["hamming"]))
    assert got == want


def test_phash_dedup_with_hamming_verify(ray_session):
    """max_hamming verify keeps the planted exact/near duplicates (tiny
    true distance) and every surviving pair's hamming is within bound."""
    import ray.data as rd

    from logjuicer_ray.functions.multimodal import (
        phash_dedup,
        synth_real_media_batch,
    )

    t = synth_real_media_batch(list(range(0, 40, 2)))
    img0 = decode_image(t.column("payload")[0].as_py())  # id 0 is a PNG
    rng = np.random.default_rng(5)
    noisy = np.clip(
        img0.astype(int) + rng.integers(-4, 5, img0.shape), 0, 255
    ).astype(np.uint8)
    extra = pa.table({
        "media_id": pa.array([1000, 1001], pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([encode_bmp(noisy), encode_bmp(img0)], pa.binary()),
        "format": pa.array(["bmp", "bmp"]),
        "width": pa.array([img0.shape[1]] * 2, pa.int32()),
        "height": pa.array([img0.shape[0]] * 2, pa.int32()),
        "sample_rate": pa.array([0, 0], pa.int32()),
    })
    full = rd.from_arrow(pa.concat_tables([t, extra]))
    out = phash_dedup(full, max_hamming=6).to_pandas()
    d = out.set_index("media_id")
    assert d.loc[1001, "dup_of"] == 0 and d.loc[1001, "hamming"] == 0
    assert d.loc[1000, "dup_of"] == 0 and d.loc[1000, "hamming"] <= 6
    assert (out["hamming"] <= 6).all()
    # unverified output is a superset of the verified one
    loose = phash_dedup(full).to_pandas()
    assert set(out["media_id"]) <= set(loose["media_id"])
