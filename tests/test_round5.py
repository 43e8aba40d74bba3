"""Round-5 regression tests for the three ADVICE findings:

1. phash/banded-Hamming dedup must verify per-band candidate pairs BEFORE
   the per-id min-root collapse (ADVICE r4 medium, multimodal.py:595).
2. hash64_hamming_filter must raise loudly on a pair id absent from the
   signature table, not silently use a neighbor's signature (dedup.py:571).
3. export_conversations must preserve the key column's original dtype
   (corpus.py:675).
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _bands_to_hash64(bands16):
    """Pack four 16-bit band values (LSB band first) into one int64."""
    v = np.uint64(0)
    for i, b in enumerate(bands16):
        v |= np.uint64(b) << np.uint64(16 * i)
    return np.int64(v.view(np.int64) if hasattr(v, "view") else v)


def test_banded_dedup_verify_runs_before_collapse(ray_session):
    """ADVICE r4 (medium): an id whose MIN band-root is a far collision
    must still keep its genuine near-duplicate found via another band.

    W=1 shares only band 0 with X=3 (overall Hamming large); Y=2 shares
    bands 1-3 with X and differs by exactly 2 bits.  The old
    post-collapse order picked dup_of=W (min id), the verify pass then
    dropped the row entirely and the true pair (X, Y) was lost."""
    from logjuicer_ray.functions.dedup import hash64_banded_dedup

    A, B, C, D = 0x1234, 0x5678, 0x9ABC, 0x0DEF
    far = lambda x: x ^ 0xFFFF  # noqa: E731 - flip all 16 bits of a band
    hx = _bands_to_hash64([A, B, C, D])            # X = 3
    hw = _bands_to_hash64([A, far(B), far(C), far(D)])  # W = 1: 48 bits away
    hy = _bands_to_hash64([A ^ 0b11, B, C, D])     # Y = 2: 2 bits away

    sigs = ray.data.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "phash": pa.array([hw, hy, hx], pa.int64()),
    }))
    out = hash64_banded_dedup(
        sigs, id_col="media_id", hash_col="phash", band_bits=16,
        max_hamming=10,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)

    # X keeps its verified near-dup root Y; Y roots to nothing closer
    # than X but Y < X so Y emits no row (root contract); W is a
    # singleton under verification.
    assert out["media_id"].tolist() == [3]
    assert out["dup_of"].tolist() == [2]
    assert out["hamming"].tolist() == [2]

    # sanity: without the verify pass the far collision W wins the min
    loose = hash64_banded_dedup(
        sigs, id_col="media_id", hash_col="phash", band_bits=16,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    # Y=2 is the min of every bucket it appears in, so it emits no row
    assert loose["media_id"].tolist() == [3]
    assert loose["dup_of"].tolist() == [1]


def test_hamming_filter_rejects_unknown_pair_ids(ray_session):
    """ADVICE r4 (low): a pair id missing from sigs_ds must be a loud
    KeyError, not a neighboring id's signature (or IndexError at the
    array end)."""
    from logjuicer_ray.functions.dedup import hash64_hamming_filter

    sigs = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "h": pa.array([0, 3], pa.int64()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 99], pa.int64()),   # 99 absent; searchsorted
        "b": pa.array([2, 2], pa.int64()),    # lands past the end
    }))
    out = hash64_hamming_filter(pairs, sigs, id_col="id", hash_col="h",
                                pair_cols=("a", "b"), max_hamming=64)
    with pytest.raises(Exception, match="absent from the signature table"):
        out.to_pandas()


def test_export_conversations_preserves_key_dtype(ray_session):
    """ADVICE r4 (low): a non-string conversation key must come back with
    its original Arrow type, not silently cast to string."""
    from logjuicer_ray.functions.corpus import export_conversations

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([10, 10, 7, 7, 7], pa.int64()),
        "turn_idx": pa.array([0, 1, 0, 1, 2], pa.int32()),
        "text": pa.array(["a", "b", "x", None, "z"], pa.string()),
    }))
    out = export_conversations(turns)
    tbl = pa.concat_tables(out.to_arrow_refs() and
                           [ray.get(r) for r in out.to_arrow_refs()])
    assert tbl.schema.field("conv_id").type == pa.int64()
    df = tbl.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert df["conv_id"].tolist() == [7, 10]
    assert df["full_text"].tolist() == ["x\n\nz", "a\nb"]
    assert df["n_turns"].tolist() == [3, 2]


# --- PNG codec (r4 verdict ask #2: stdlib-only PNG decode) ----------------

def _png_with_filters(img, filters):
    """Independent PNG writer applying a CHOSEN filter per scanline
    (spec-correct filtering, so decode must invert all five types)."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    out = bytearray()
    prior = np.zeros(w * bpp, np.int16)
    for y, f in zip(range(h), filters):
        line = img[y].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prior
        elif f == 3:
            filt = line - ((left + prior) >> 1)
        else:  # paeth
            p = left + prior - upleft
            pa_, pb, pc = (np.abs(p - left), np.abs(p - prior),
                           np.abs(p - upleft))
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prior, upleft))
            filt = line - pred
        out.append(f)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    from logjuicer_ray.functions.multimodal import decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    # every scanline gets a different filter, cycling through all five
    filters = [y % 5 for y in range(10)]
    assert np.array_equal(decode_png(_png_with_filters(img, filters)), img)
    for f in range(5):
        assert np.array_equal(
            decode_png(_png_with_filters(img, [f] * 10)), img
        ), f"filter {f}"


def test_png_gray_and_rgba_normalize_to_rgb():
    import struct
    import zlib

    from logjuicer_ray.functions.multimodal import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x2 grayscale (color type 0)
    gray = np.array([[1, 2], [3, 4]], np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))
    buf = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(buf)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)
    # 2x1 RGBA (color type 6): alpha dropped
    rgba = np.array([[[10, 20, 30, 255], [40, 50, 60, 0]]], np.uint8)
    raw = b"\x00" + rgba.reshape(-1).tobytes()
    buf = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), rgba[:, :, :3])


def test_png_rejects_unsupported():
    import struct
    import zlib

    import pytest as _pytest

    from logjuicer_ray.functions.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnotapng")
    # interlaced (Adam7) raises instead of decoding garbage
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
           + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
           + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(buf)
    # IDAT inflates to fewer bytes than h*(1+stride): explicit error
    short = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
             + chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="truncated"):
        decode_png(short)
    # a cut mid-IDAT normalizes to ValueError (zlib.error is wrapped so
    # every codec raises ONE corrupt-payload type)
    rng = np.random.default_rng(1)
    big = encode_png(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="corrupt PNG deflate"):
        decode_png(big[:100])


def test_png_and_bmp_same_pixels_same_phash():
    """r4 ask #2 done-criterion: the PNG path joins the BMP path on
    identical pixel arrays — identical decode, identical phash64."""
    from logjuicer_ray.functions.multimodal import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
        phash64,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
    a, b = decode_png(encode_png(img)), decode_bmp(encode_bmp(img))
    assert np.array_equal(a, b)
    assert phash64(a) == phash64(b)


# --- correctness-window rotation (r4 verdict ask #3) ----------------------

def test_driver_window_is_all_hard_oracle_and_rotated():
    """The driver certifies the first 50 queries() entries: every one
    must carry a DuckDB oracle, and the round-5 window must consist of
    the flagship core plus entries the r1-r4 windows never certified."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    window = names[:50]
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]
    # flagship core stays in-window
    for core in ["report_unknown_routed", "report_counts",
                 "errors_triggers", "exact_dedup_docs",
                 "minhash_dedup_docs", "turn_lines"]:
        assert core in window
    # rotation actually happened: the bulk of the r4 window moved out
    r4_window_tail = ["turn_counts", "group_volume", "events_window",
                      "tpch_q3", "knn_bruteforce", "orders_window",
                      "lineitem_agg", "turns_export"]
    assert all(n not in window for n in r4_window_tail)
    assert all(n in names for n in r4_window_tail)


# --- vectorized token assembly (r4 verdict ask #8) ------------------------

def test_vectorized_assembly_parity_with_python_path():
    """_assemble_tokens_vectorized must equal _process_words exactly on
    pre-stripped lines — golden cases, separators, escapes, and the
    consumed-lookahead fallback."""
    import pyarrow.compute as pc

    from logjuicer_ray.stages.tokenize import _assemble_tokens_vectorized
    from logjuicer_ray.tokenizer import _process_words, _word_process

    lines = [
        "sha256://toto tata finished in 00ms by systemd[0000]",
        "systemd starting service alpha now",
        "a\\nb\\rc multi escape words here",
        "key=value other=00 path=/var/log/app.log",
        "tab\tseparated\twords here",
        "trailing spaces line   ",
        "%odd {chars} present, here",
        "many-dash-word and one ----------x noise",
        "word/path/deep/split here",
        "двойной юникод текст тут",
        "",
    ]
    arr = pc.utf8_trim_whitespace(pa.array(lines, pa.string()))
    toks_v, fb = _assemble_tokens_vectorized(arr)
    stripped = arr.to_pylist()
    for i, s in enumerate(stripped):
        if toks_v[i] is None:
            assert fb[i]
            continue
        assert toks_v[i] == _process_words(s), (s, toks_v[i])

    # a consuming word (password key) must route the LINE to fallback —
    # the skip is data-dependent along the line, so the pure per-word
    # map cannot assemble it
    assert _word_process("password:")[2] > 0  # sanity: consumes lookahead
    consuming = pa.array(["login password: hunter0 done"], pa.string())
    toks_c, fb_c = _assemble_tokens_vectorized(consuming)
    assert fb_c[0] and toks_c[0] is None


def test_tokenize_batch_end_to_end_with_vectorized_assembly(ray_session):
    """tokenize_batch (which now routes cache misses through the
    vectorized assembly) must equal per-line process() on a mixed batch,
    including the consuming-password and suspect-whitespace rows that
    take the exact Python paths."""
    from logjuicer_ray.stages.tokenize import (
        _token_cache,
        tokenize_batch,
    )
    from logjuicer_ray.tokenizer import GL_FILTER, process

    _token_cache.clear() if hasattr(_token_cache, "clear") else None
    texts = [
        "service started on port 8080 ok",
        "single-word-line",
        "GET / HTTP/1.1",
        "login password: hunter2 secret done",
        "weird\x1cwhitespace separated line",
        "error failed with code 17 here",
        None,
        "service started on port 9090 ok",  # digit-variant of row 0
    ]
    n = len(texts)
    batch = pa.table({
        "conv_id": pa.array(["c"] * n), "turn_idx": pa.array(range(n), pa.int64()),
        "role": pa.array(["file"] * n), "text": pa.array(texts, pa.string()),
        "tool": pa.array([""] * n), "ts": pa.nulls(n, pa.timestamp("us")),
    })
    out = tokenize_batch(batch)
    toks = [t if t is not None else "" for t in out.column("tokens").to_pylist()]
    import re
    for i, t in enumerate(texts):
        raw = t or ""
        # fold digits like the stage does, then compare with process()
        folded = re.sub(r"[0-9]", "0", raw)
        expect = process(folded) if folded.strip() else ""
        assert toks[i] == expect, (i, t, toks[i], expect)
    # digit variants share one tokenization
    assert toks[0] == toks[7]
    assert toks[1] == GL_FILTER
    # toks[2] ("GET / HTTP/1.1") folds to HTTP/0.0 first, so the literal
    # GL pattern can't match — the stage's documented digit-fold caveat;
    # the loop above already asserted stage ≡ process(folded) for it.


# --- corrupt-payload robustness (round-5 hardening) -----------------------

def test_codecs_raise_only_valueerror_on_corruption():
    """Every media codec must normalize corrupt-payload failures to
    ValueError (the one type the stages' skip_corrupt mode catches) —
    fuzzed with byte flips, truncations and junk tails."""
    from logjuicer_ray.functions import multimodal as mm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    pcm = rng.integers(-32768, 32768, 2048).astype(np.int16)
    cases = {
        "bmp": (mm.encode_bmp(img), mm.decode_bmp),
        "png": (mm.encode_png(img), mm.decode_png),
        "ppm": (mm.encode_ppm(img), mm.decode_ppm),
        "wav": (mm.encode_wav(pcm, 8000), mm.decode_wav),
        "fpk": (mm.encode_framepack([img, img], fps=5),
                mm.decode_framepack_index),
    }
    for name, (buf, decode) in cases.items():
        for _ in range(400):
            b = bytearray(buf)
            for _ in range(int(rng.integers(1, 5))):
                k = rng.integers(0, 3)
                if k == 0 and len(b) > 1:
                    b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
                elif k == 1 and len(b) > 4:
                    del b[int(rng.integers(1, len(b))):]
                else:
                    b += bytes(rng.integers(0, 256, int(rng.integers(1, 32)),
                                            dtype=np.uint8))
            try:
                decode(bytes(b))
            except ValueError:
                pass  # the one allowed failure type
            # any other exception type propagates and fails the test


def test_decode_stages_skip_corrupt_rows():
    """skip_corrupt=True: a truncated payload yields null features
    instead of failing the task; default mode still raises."""
    from logjuicer_ray.functions.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        VideoFrameSampleStage,
        encode_bmp,
        encode_framepack,
        encode_wav,
        synth_real_media_batch,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    good = synth_real_media_batch([0, 2, 1, 3])  # png, bmp, 2x wav
    bad_img = pa.table({
        "media_id": pa.array([99], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_bmp(img)[:30]], pa.binary()),
        "format": pa.array(["bmp"]),
        "width": pa.array([16], pa.int32()),
        "height": pa.array([16], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
    })
    imgs = pa.concat_tables(
        [good.filter(pa.compute.equal(good.column("kind"), "image")), bad_img]
    )
    out = ImageDecodeStage(skip_corrupt=True)(imgs)
    d = dict(zip(out.column("media_id").to_pylist(),
                 out.column("phash").to_pylist()))
    assert d[99] is None and d[0] is not None and d[2] is not None
    with pytest.raises(ValueError):
        ImageDecodeStage()(imgs)

    bad_wav = bad_img.set_column(
        bad_img.schema.get_field_index("payload"), "payload",
        pa.array([encode_wav(np.zeros(64, np.int16), 8000)[:14]], pa.binary()),
    ).set_column(bad_img.schema.get_field_index("format"), "format",
                 pa.array(["wav"]))
    auds = pa.concat_tables(
        [good.filter(pa.compute.equal(good.column("kind"), "audio")), bad_wav]
    )
    aout = AudioFeatureStage(skip_corrupt=True)(auds)
    ad = dict(zip(aout.column("media_id").to_pylist(),
                  aout.column("audio_fp").to_pylist()))
    assert ad[99] is None and ad[1] is not None
    with pytest.raises(ValueError):
        AudioFeatureStage()(auds)

    bad_vid = bad_img.set_column(
        bad_img.schema.get_field_index("payload"), "payload",
        pa.array([encode_framepack([img], fps=5)[:10]], pa.binary()),
    ).set_column(bad_img.schema.get_field_index("format"), "format",
                 pa.array(["fpk"]))
    vout = VideoFrameSampleStage(skip_corrupt=True)(bad_vid)
    assert vout.column("frame_phashes").to_pylist() == [None]
    with pytest.raises(ValueError):
        VideoFrameSampleStage()(bad_vid)


def test_corrupt_tarball_skipped_in_dir_scan(ray_session, tmp_path):
    """A corrupt tarball in a directory scan is skipped; the other files
    still produce rows (never fail the whole 100-TB scan for one bad
    archive)."""
    import tarfile as _t

    from logjuicer_ray.sources.rawfiles import read_file_lines

    d = tmp_path / "logs"
    d.mkdir()
    (d / "app.log").write_text("line one here\nline two here\n")
    with _t.open(d / "good.tar", "w") as tf:
        data = b"inside tar line\n"
        info = _t.TarInfo("member.log")
        info.size = len(data)
        import io as _io
        tf.addfile(info, _io.BytesIO(data))
    (d / "broken.tar").write_bytes(b"not a tar at all" * 40)
    ds = read_file_lines(str(d))
    df = ds.to_pandas()
    texts = set(df["text"])
    assert "line one here" in texts and "inside tar line" in texts
    assert not any("broken" in c for c in set(df["conv_id"]))


def test_read_errors_surface_in_cli_summary(ray_session, tmp_path):
    """report.rs:112 read_errors parity: corrupt sources are skipped AND
    listed in summary.json — never silent.  Covers both the raw-file dir
    scan (bad .gz) and the tarball dir scan (corrupt archive)."""
    import io as _io
    import json
    import tarfile as _t

    from logjuicer_ray.cli import main as cli_main

    base = "\n".join(f"service ok heartbeat seq {i}" for i in range(30))

    rawdir = tmp_path / "rawlogs"
    rawdir.mkdir()
    (rawdir / "app.log").write_text(base + "\n")
    (rawdir / "bad.gz").write_bytes(b"\x1f\x8b\x08\x00garbage-after-magic")
    baseline = tmp_path / "base.log"
    baseline.write_text(base + "\n")

    out1 = str(tmp_path / "out1")
    rc = cli_main(["report", "--target", str(rawdir),
                   "--baseline", str(baseline), "--out", out1, "--quiet"])
    assert rc == 0
    errs = dict(json.load(open(out1 + "/summary.json"))["read_errors"])
    assert any(k.endswith("bad.gz") for k in errs)
    msg = next(v for k, v in errs.items() if k.endswith("bad.gz"))
    assert msg.split(":")[0] in ("BadGzipFile", "EOFError", "OSError", "error")

    tardir = tmp_path / "tars"
    tardir.mkdir()
    with _t.open(tardir / "ok.tar", "w") as tf:
        data = (base + "\n").encode()
        info = _t.TarInfo("m.log")
        info.size = len(data)
        tf.addfile(info, _io.BytesIO(data))
    (tardir / "broken.tar").write_bytes(b"definitely not a tarball" * 64)

    out2 = str(tmp_path / "out2")
    rc = cli_main(["report", "--target", str(tardir),
                   "--baseline", str(baseline), "--out", out2, "--quiet"])
    assert rc == 0
    errs2 = dict(json.load(open(out2 + "/summary.json"))["read_errors"])
    assert any(k.endswith("broken.tar") for k in errs2)
    assert not any(k.endswith("ok.tar") for k in errs2)


# --- crates/python bindings parity surface (logjuicer_ray.api) ------------

def test_api_bindings_surface():
    """The reference's 4-function Python-bindings API
    (crates/python/src/lib.rs): process/generate/index/search."""
    from logjuicer_ray.api import generate, index, process, search

    assert process("sha256://toto tata finished in 28ms by systemd[4248]") \
        == "%HASH tata finished %ID systemd%PID"

    g = generate(50)
    lines = g.split("\n")
    assert len(lines) == 50
    assert generate(50) == g  # deterministic
    for ln in lines[:10]:
        words = ln.split(" ")
        assert 2 <= len(words) <= 9
        assert all(2 <= len(w) <= 17 and w.isalnum() for w in words)

    base = [process(ln) for ln in
            ["service started on port 8080 ok",
             "uuid 9bc0e608-8b46-44c6-bca3-7e33a3c3d526 task done fine",
             "copy to /tmp/tmp8x2f1 finished quick"]]
    model = index(base)
    # a line differing only in random material scores ~0
    same = process("uuid 11111111-2222-3333-4444-555555555555 task done fine")
    assert abs(search(model, same)) < 1e-5
    # an anomalous line scores high
    assert search(model, process("kernel panic unrecoverable fs corruption")) > 0.3


def test_driver_cc_min_label_matches_union_find_reference():
    """The vectorized min-label CC (round-5 rebuild of the per-edge
    Python union-find) must produce identical (id -> component-min)
    mappings on random multigraphs with self-loops and duplicates."""
    from logjuicer_ray.functions.dedup import _driver_union_find

    def ref_cc(a, b):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        return {x: find(x) for x in set(a) | set(b) if find(x) != x}

    rng = np.random.default_rng(0)
    for trial in range(200):
        m = int(rng.integers(1, 60))
        a = rng.integers(0, 40, m).astype(np.int64)
        b = rng.integers(0, 40, m).astype(np.int64)
        t = pa.table({"doc_id": pa.array(a), "dup_of": pa.array(b)})
        out = _driver_union_find(t, "doc_id")
        got = dict(zip(out.column("doc_id").to_pylist(),
                       out.column("component").to_pylist()))
        assert got == ref_cc(a.tolist(), b.tolist()), trial
