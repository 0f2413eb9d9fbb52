"""Pure-spec RIFF/WAVE PCM codec (operators/multimodal.py — VERDICT r3
item 4): the decoder must parse arbitrary spec-conformant WAV files,
not just our fixtures — chunk walking, pad bytes, all PCM widths,
loud failures on non-PCM."""

from __future__ import annotations

import struct

import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    multimodal as MM,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.operators.multimodal import (
    _lcg_samples,
    decode_wav,
    encode_wav,
    synth_wav_payloads,
    wav_decode_stats,
    wav_fixture_params,
)


def test_roundtrip_all_widths():
    samples = [0, 1, -1, 100, -100, 127, -128]
    for bits, lo, hi in ((8, -128, 127), (16, -32768, 32767),
                         (24, -(2**23), 2**23 - 1), (32, -(2**31), 2**31 - 1)):
        vals = samples + [lo, hi]
        st = decode_wav(encode_wav(44100, 1, vals, bits=bits))
        assert st["bits"] == bits
        assert st["sample_rate"] == 44100
        assert st["channels"] == 1
        assert st["n_samples"] == len(vals)
        assert st["sum_samples"] == sum(vals)
        assert st["sum_squares"] == sum(v * v for v in vals)
        assert st["peak_amp"] == max(abs(v) for v in vals)


def test_stereo_interleaved():
    st = decode_wav(encode_wav(8000, 2, [1, -2, 3, -4], bits=16))
    assert st["channels"] == 2
    assert st["n_samples"] == 4
    assert st["sum_samples"] == -2


def test_skips_unknown_chunks_and_pads():
    # LIST chunk before fmt, plus an odd-sized junk chunk (pad byte)
    wav = encode_wav(16000, 1, [5, -7, 9], bits=16)
    chunks = wav[12:]  # fmt + data chunks (after RIFF header + 'WAVE')
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    odd = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    patched = b"RIFF" + struct.pack(
        "<I", 4 + len(extra) + len(odd) + len(chunks)
    ) + b"WAVE" + extra + odd + chunks
    st = decode_wav(patched)
    assert st["n_samples"] == 3
    assert st["sum_samples"] == 7
    assert st["peak_amp"] == 9


def test_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOTAWAVFILE")
    wav = bytearray(encode_wav(8000, 1, [1, 2], bits=16))
    # audio_format lives at offset 20 (RIFF8 + WAVE4 + 'fmt '4 + size4)
    struct.pack_into("<H", wav, 20, 3)  # 3 = IEEE float
    with pytest.raises(ValueError, match="not PCM"):
        decode_wav(bytes(wav))


def test_zero_length_data():
    st = decode_wav(encode_wav(8000, 1, [], bits=16))
    assert st["n_samples"] == 0 and st["peak_amp"] == 0


def test_spark_decode_matches_local(spark):
    docs = spark.range(0, 7).withColumnRenamed("id", "doc_id")
    wav = synth_wav_payloads(docs)
    got = {r["doc_id"]: r for r in wav_decode_stats(wav).collect()}
    for d in range(7):
        rate, ch, frames = wav_fixture_params(d)
        vals = _lcg_samples(d, frames * ch)
        r = got[d]
        assert r["sample_rate"] == rate
        assert r["n_channels"] == ch
        assert r["n_samples"] == frames * ch
        assert r["peak_amp"] == max(abs(v) for v in vals)
        assert r["mean_amp"] == sum(vals) / len(vals)


# ---------------------------------------------------------------------------
# PPM (P6) image codec — same pure-spec precedent, image plane
# ---------------------------------------------------------------------------

from open_source_financial_time_series_data_pipeline_architecture_spark.operators.multimodal import (  # noqa: E402
    _lcg_pixels,
    decode_ppm,
    encode_ppm,
    ppm_decode_stats,
    ppm_fixture_params,
    synth_ppm_payloads,
)


def test_ppm_roundtrip():
    pixels = [(i * 37) % 256 for i in range(4 * 3 * 3)]
    st = decode_ppm(encode_ppm(4, 3, pixels))
    assert (st["width"], st["height"], st["maxval"]) == (4, 3, 255)
    assert st["n_pixels"] == 12
    assert st["sum_all"] == sum(pixels)
    assert st["sum_r"] == sum(pixels[0::3])
    assert st["max_byte"] == max(pixels)


def test_ppm_header_comments_and_whitespace():
    raster = bytes([10, 20, 30, 40, 50, 60])
    payload = b"P6\n# a comment\n 2 \n# another\n1\n255\n" + raster
    st = decode_ppm(payload)
    assert (st["width"], st["height"]) == (2, 1)
    assert st["sum_all"] == sum(raster)


def test_ppm_rejects_bad_payloads():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_ppm_spark_decode_matches_local(spark):
    docs = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in ppm_decode_stats(synth_ppm_payloads(docs)).collect()}
    for d in range(6):
        w, h = ppm_fixture_params(d)
        px = _lcg_pixels(d, w * h * 3)
        r = got[d]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["max_byte"] == max(px)
        assert r["mean_r"] == sum(px[0::3]) / (w * h)
        assert r["brightness"] == sum(px) / (3 * w * h)


# ---------------------------------------------------------------------------
# PNG codec — DEFLATE (stdlib zlib) + chunk CRCs + all five scanline
# filters, written from the W3C spec
# ---------------------------------------------------------------------------

from open_source_financial_time_series_data_pipeline_architecture_spark.operators.multimodal import (  # noqa: E402
    _PNG_CHANNELS,
    decode_png,
    encode_png,
    png_decode_stats,
    png_fixture_params,
    synth_png_payloads,
)


def test_png_roundtrip_all_color_types():
    # heights >= 5 so every filter type (row % 5) is exercised
    for ct in (0, 2, 6):
        ch = _PNG_CHANNELS[ct]
        w, h = 7, 6
        px = [(i * 91 + ct) % 256 for i in range(w * h * ch)]
        st = decode_png(encode_png(w, h, px, ct))
        assert (st["width"], st["height"], st["channels"]) == (w, h, ch)
        assert st["n_pixels"] == w * h
        assert st["sum_all"] == sum(px)
        assert st["sum_c0"] == sum(px[0::ch])
        assert st["max_byte"] == max(px)


def test_png_concatenates_split_idat():
    # encoder splits the DEFLATE stream across two IDAT chunks; a
    # decoder that doesn't concatenate per spec fails to inflate
    payload = encode_png(5, 5, list(range(75)), 2)
    assert payload.count(b"IDAT") == 2
    assert decode_png(payload)["sum_all"] == sum(range(75))


def test_png_skips_ancillary_chunks():
    import struct as _struct
    import zlib as _zlib

    payload = encode_png(3, 5, [(i * 7) % 256 for i in range(45)], 2)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    data = b"Comment\x00hello"
    text = (
        _struct.pack(">I", len(data))
        + b"tEXt"
        + data
        + _struct.pack(">I", _zlib.crc32(b"tEXt" + data) & 0xFFFFFFFF)
    )
    patched = payload[:ihdr_end] + text + payload[ihdr_end:]
    assert decode_png(patched)["sum_all"] == sum((i * 7) % 256 for i in range(45))


def test_png_rejects_corruption():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89JPG" + bytes(20))
    payload = bytearray(encode_png(4, 4, list(range(48)), 2))
    payload[30] ^= 0xFF  # inside IHDR data -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_spark_decode_matches_local(spark):
    docs = spark.range(0, 9).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in png_decode_stats(synth_png_payloads(docs)).collect()}
    for d in range(9):
        w, h, ct = png_fixture_params(d)
        ch = _PNG_CHANNELS[ct]
        px = _lcg_pixels(d, w * h * ch)
        r = got[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["max_byte"] == max(px)
        assert r["mean_c0"] == sum(px[0::ch]) / (w * h)
        assert r["mean_all"] == sum(px) / (w * h * ch)


# ---------------------------------------------------------------------------
# YUV4MPEG2 video codec — header tokens, FRAME markers, plane geometry,
# every-k-th frame sampling
# ---------------------------------------------------------------------------

from open_source_financial_time_series_data_pipeline_architecture_spark.operators.multimodal import (  # noqa: E402
    _y4m_frame_bytes,
    decode_y4m_frames,
    encode_y4m,
    synth_y4m_payloads,
    y4m_fixture_params,
    y4m_frame_sample,
)


def test_y4m_roundtrip_mono_and_420():
    for cs in ("mono", "420jpeg"):
        w, h, nf = 6, 4, 5
        fsize = _y4m_frame_bytes(w, h, cs)
        frames = [bytes((f * 31 + j) % 256 for j in range(fsize)) for f in range(nf)]
        st = decode_y4m_frames(encode_y4m(w, h, 24, 1, cs, frames), every=1)
        assert st["n_frames"] == nf
        assert (st["width"], st["height"], st["fps_num"]) == (w, h, 24)
        for idx, luma_sum, luma_max in st["frames"]:
            plane = frames[idx][: w * h]
            assert luma_sum == sum(plane) and luma_max == max(plane)


def test_y4m_sampling_rule():
    w, h, cs, nf = 4, 4, "mono", 7
    frames = [bytes([f] * 16) for f in range(nf)]
    st = decode_y4m_frames(encode_y4m(w, h, 30, 1, cs, frames), every=3)
    assert [f[0] for f in st["frames"]] == [0, 3, 6]
    assert st["n_frames"] == nf


def test_y4m_skips_unknown_header_tokens():
    payload = encode_y4m(4, 4, 30, 1, "mono", [bytes(16)])
    patched = payload.replace(
        b"Ip A1:1", b"Ip A1:1 Xcustom=1", 1
    )
    st = decode_y4m_frames(patched)
    assert st["n_frames"] == 1 and st["width"] == 4


def test_y4m_rejects_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m_frames(b"MPEG4 nope\n")
    trunc = encode_y4m(4, 4, 30, 1, "mono", [bytes(16)])[:-4]
    with _pytest.raises(ValueError, match="truncated"):
        decode_y4m_frames(trunc)


def test_y4m_spark_sample_matches_local(spark):
    docs = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    rows = y4m_frame_sample(synth_y4m_payloads(docs), every=2).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(6):
        w, h, fps, nf, cs = y4m_fixture_params(d)
        fsize = _y4m_frame_bytes(w, h, cs)
        stream = _lcg_pixels(d, nf * fsize)
        sampled = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in sampled] == list(range(0, nf, 2))
        for r in sampled:
            plane = stream[r["frame_idx"] * fsize : r["frame_idx"] * fsize + w * h]
            assert r["luma_mean"] == sum(plane) / (w * h)
            assert r["luma_max"] == max(plane)
            assert r["frame_ts_ms"] == r["frame_idx"] * 1000 // fps


# -- JPEG (baseline, ITU T.81 pure-spec) -----------------------------------


def _jpeg_fixture(doc_id):
    w, h, ch = MM.jpeg_fixture_params(doc_id)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    luma = [MM._jpeg_fixture_zz(doc_id, k) for k in range(bw_ * bh_)]
    chroma = (
        ([[0] * 64] * (bw_ * bh_), [[0] * 64] * (bw_ * bh_))
        if ch == 3
        else None
    )
    return w, h, ch, MM.encode_jpeg_blocks(w, h, luma, chroma)


def _jpeg_expected(doc_id, x, y, bw_):
    k = (y // 8) * bw_ + (x // 8)
    dc = (doc_id * 2654435761 + (4 * k) * 40503) % 41 - 20
    v40 = (doc_id * 2654435761 + (4 * k + 1) * 40503) % 31 - 15
    v04 = (doc_id * 2654435761 + (4 * k + 2) * 40503) % 31 - 15
    v44 = (doc_id * 2654435761 + (4 * k + 3) * 40503) % 31 - 15
    sx = 1 if (x % 8) % 4 in (0, 3) else -1
    sy = 1 if (y % 8) % 4 in (0, 3) else -1
    return 128 + 2 * dc + sx * v40 + sy * v04 + sx * sy * v44


def test_jpeg_roundtrip_closed_form_gray_and_color():
    """Huffman + dequant + IDCT + (zero-chroma) color conversion invert
    the chosen-coefficient stream to the closed-form pixel values —
    every pixel, grayscale and interleaved YCbCr, cropped dims."""
    for d in (0, 1, 2, 3, 4, 5, 10, 37):
        w, h, ch, payload = _jpeg_fixture(d)
        st = MM.decode_jpeg(payload)
        assert (st["width"], st["height"], st["channels"]) == (w, h, ch)
        px = st["pixels"]
        bw_ = -(-w // 8)
        for y in range(h):
            for x in range(w):
                e = _jpeg_expected(d, x, y, bw_)
                got = px[(y * w + x) * ch : (y * w + x + 1) * ch]
                assert all(g == e for g in got), (d, x, y, e, list(got))


def test_jpeg_420_subsampling_with_live_chroma():
    """2x2 luma sampling: 4 luma blocks per MCU + 1 Cb + 1 Cr, chroma
    DC-only with NONZERO values — pins MCU interleave order, plane
    placement, replicated upsampling and the BT.601 conversion
    arithmetic (expected values recompute conversion only)."""
    import math

    w = h = 16  # one MCU at 2x2
    luma = [MM._jpeg_fixture_zz(9, k) for k in range(4)]
    cb = [[0] * 64]
    cb[0][0] = 4  # dequantized 64 -> IDCT adds 8 -> Cb = 136
    cr = [[0] * 64]
    cr[0][0] = -6  # -96/8 = -12 -> Cr = 116
    payload = MM.encode_jpeg_blocks(w, h, luma, (cb, cr), sampling=(2, 2))
    st = MM.decode_jpeg(payload)
    assert (st["width"], st["height"], st["channels"]) == (16, 16, 3)
    px = st["pixels"]
    for y in range(h):
        for x in range(w):
            # luma block index inside the MCU: raster of 8x8 quadrants
            k = (y // 8) * 2 + (x // 8)
            yv = _jpeg_expected(9, x % 8, y % 8, 1) + 2 * (
                MM._jpeg_fixture_zz(9, k)[0] - MM._jpeg_fixture_zz(9, 0)[0]
            )
            # recompute from the block's own dc instead: full formula
            zz = MM._jpeg_fixture_zz(9, k)
            sx = 1 if (x % 8) % 4 in (0, 3) else -1
            sy = 1 if (y % 8) % 4 in (0, 3) else -1
            yv = (
                128 + 2 * zz[0]
                + sx * zz[MM._JPEG_ZZ_OF[(0, 4)]]
                + sy * zz[MM._JPEG_ZZ_OF[(4, 0)]]
                + sx * sy * zz[MM._JPEG_ZZ_OF[(4, 4)]]
            )
            cbv, crv = 136 - 128, 116 - 128
            r = int(math.floor(yv + 1.402 * crv + 0.5))
            g = int(math.floor(yv - 0.344136 * cbv - 0.714136 * crv + 0.5))
            b = int(math.floor(yv + 1.772 * cbv + 0.5))
            clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)
            o = (y * w + x) * 3
            assert list(px[o : o + 3]) == [clamp(r), clamp(g), clamp(b)], (x, y)


def test_jpeg_restart_markers():
    """DRI/RSTn: predictors reset and the bit reader re-aligns at every
    restart interval — same pixels as the unrestarted stream."""
    d = 5
    w, h = 24, 16  # 3x2 blocks, grayscale
    bw_ = 3
    luma = [MM._jpeg_fixture_zz(d, k) for k in range(6)]
    plain = MM.decode_jpeg(MM.encode_jpeg_blocks(w, h, luma))
    restarted = MM.decode_jpeg(
        MM.encode_jpeg_blocks(w, h, luma, restart_interval=2)
    )
    assert plain["pixels"] == restarted["pixels"]
    for y in range(h):
        for x in range(w):
            assert restarted["pixels"][y * w + x] == _jpeg_expected(
                d, x, y, bw_
            )


def test_jpeg_rejects_unsupported_and_garbage():
    import struct

    import pytest

    w, h, ch, payload = _jpeg_fixture(1)
    with pytest.raises(ValueError, match="SOI"):
        MM.decode_jpeg(b"\x89PNG1234")
    # flip SOF0 -> SOF2 (progressive)
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        MM.decode_jpeg(prog)
    # corrupt a Huffman table length so scan decode derails
    with pytest.raises(ValueError):
        MM.decode_jpeg(payload[:-10])  # truncated entropy segment


def test_jpeg_16bit_quant_table_parse():
    """Pq=1 (16-bit) DQT entries parse and dequantize identically when
    the values fit in 8 bits."""
    w, h, ch, payload = _jpeg_fixture(2)
    # rebuild the DQT segment as 16-bit: find FFDB, expand
    import struct

    i = payload.index(b"\xff\xdb")
    ln = struct.unpack_from(">H", payload, i + 2)[0]
    body = payload[i + 4 : i + 2 + ln]
    tq = body[0] & 15
    vals = body[1:65]
    wide = bytes([0x10 | tq]) + b"".join(
        struct.pack(">H", v) for v in vals
    )
    seg = b"\xff\xdb" + struct.pack(">H", len(wide) + 2) + wide
    patched = payload[:i] + seg + payload[i + 2 + ln :]
    assert MM.decode_jpeg(patched)["pixels"] == MM.decode_jpeg(payload)["pixels"]


def test_jpeg_spark_decode_matches_local(spark):
    """The Spark plumbing: synth payloads + decode stats over a real
    documents slice, validated against the local closed form."""
    from pyspark.sql import functions as F

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    st = MM.jpeg_decode_stats(MM.synth_jpeg_payloads(docs)).collect()
    assert len(st) == 24
    for r in st:
        d = r["doc_id"]
        w, h, ch = MM.jpeg_fixture_params(d)
        bw_ = -(-w // 8)
        exp = [
            _jpeg_expected(d, x, y, bw_)
            for y in range(h)
            for x in range(w)
        ]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["n_pixels"] == w * h
        assert r["mean_c0"] == sum(exp) / len(exp)
        assert r["mean_all"] == sum(exp) / len(exp)
        assert r["max_byte"] == max(exp)


# -- perceptual image fingerprint (aHash) ----------------------------------


def test_ahash_identical_images_collide_and_perturbed_stay_close():
    w, h = 12, 10
    base = [(7 * i + 13) % 256 for i in range(w * h)]
    h0 = MM.ahash_bits(w, h, base)
    assert h0 == MM.ahash_bits(w, h, list(base))  # deterministic
    # a mild global brightness shift preserves every block-vs-mean
    # comparison exactly (means shift together)
    brighter = [v + 10 for v in base]
    assert MM.ahash_bits(w, h, brighter) == h0
    # zeroing one block's pixels flips few bits
    perturbed = list(base)
    for y in range(0, h // 4):
        for x in range(0, w // 4):
            perturbed[y * w + x] = 0
    hp = MM.ahash_bits(w, h, perturbed)
    assert 0 < bin(h0 ^ hp).count("1") <= 8  # local damage stays local


def test_ahash_neardup_pairs_banded_join_complete(spark):
    """The banded join must find EVERY pair with hamming <= 3 — compare
    against brute force over the same fingerprints."""
    from itertools import combinations

    from pyspark.sql import functions as F

    docs = spark.range(0, 80).select(F.col("id").alias("doc_id"))
    hashes = MM.image_ahash(MM.synth_ppm_payloads(docs))
    rows = {r["doc_id"]: r["ahash"] for r in hashes.collect()}
    # local truth: decoder hash equals the direct closed-form hash
    for d, hv in rows.items():
        w, hgt = 8 + d % 9, 6 + d % 7
        px = [(d * 2654435761 + i * 48271) % 256 for i in range(w * hgt * 3)]
        luma = [px[3 * i] + px[3 * i + 1] + px[3 * i + 2] for i in range(w * hgt)]
        assert hv == MM.ahash_bits(w, hgt, luma)
    brute = {
        (a, b)
        for a, b in combinations(sorted(rows), 2)
        if bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in MM.ahash_neardup_pairs(hashes).collect()
    }
    assert got == brute and all(a < b for a, b in got)


def test_jpeg_rejects_unsupported_component_counts():
    """4-component (Adobe CMYK) baseline streams must fail loudly, not
    decode three planes as garbage RGB."""
    import struct

    import pytest

    w, h, ch, payload = _jpeg_fixture(1)  # 3-component stream
    i = payload.index(b"\xff\xc0")
    ln = struct.unpack_from(">H", payload, i + 2)[0]
    body = bytearray(payload[i + 4 : i + 2 + ln])
    body[5] = 4  # Nf: 3 -> 4 (no 4th spec bytes needed: parse reads Nf first)
    patched = (
        payload[:i]
        + b"\xff\xc0"
        + struct.pack(">H", len(body) + 2)
        + bytes(body)
        + payload[i + 2 + ln :]
    )
    with pytest.raises(ValueError, match="component count"):
        MM.decode_jpeg(patched)


# -- GIF (GIF89a + LZW, pure-spec) ------------------------------------------


def test_gif_lzw_roundtrip_with_table_growth_and_reset():
    import random

    rng = random.Random(3)
    for mcs in (2, 4, 8):
        pat = [rng.randrange(1 << mcs) for _ in range(5)]
        seq = (pat * 2000)[: 6000]  # repetitive: deep table growth
        assert MM.lzw_decode_gif(MM.lzw_encode_gif(seq, mcs), mcs, len(seq)) == seq
        rnd = [rng.randrange(1 << mcs) for _ in range(777)]
        assert MM.lzw_decode_gif(MM.lzw_encode_gif(rnd, mcs), mcs, len(rnd)) == rnd
    # the 4096-entry ceiling: random 8-bit symbols add ~1 table entry
    # per emitted code, so 10k of them force the 12-bit width cap AND
    # at least one mid-stream CLEAR/reset on both sides (a prior
    # version of this test never actually reached the reset branch)
    big = [rng.randrange(256) for _ in range(10_000)]
    enc = MM.lzw_encode_gif(big, 8)
    assert MM.lzw_decode_gif(enc, 8, len(big)) == big


def test_gif_roundtrip_and_extension_skipping():
    pal = [(i, 255 - i, (i * 7) % 256) for i in range(256)]
    idx = [(j * 37) % 256 for j in range(12 * 9)]
    payload = MM.encode_gif(12, 9, pal, idx)
    assert b"\x21\xf9" in payload  # GCE present -> decoder must skip it
    st = MM.decode_gif(payload)
    assert (st["width"], st["height"]) == (12, 9)
    assert st["indices"] == idx
    assert [tuple(p) for p in st["palette"][:256]] == pal


def test_gif_rejects_garbage_and_interlace():
    import pytest

    with pytest.raises(ValueError, match="not a GIF"):
        MM.decode_gif(b"PNG89a" + bytes(20))
    pal = [(0, 0, 0), (255, 255, 255), (1, 2, 3), (4, 5, 6)]
    payload = bytearray(MM.encode_gif(4, 4, pal, [0, 1, 2, 3] * 4))
    # the image descriptor follows the 8-byte graphic control extension
    # (a bare index(0x2C) could hit a palette byte)
    i = payload.index(b"\x21\xf9") + 8
    assert payload[i] == 0x2C
    payload[i + 9] |= 0x40  # set the interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        MM.decode_gif(bytes(payload))
    with pytest.raises(ValueError):
        MM.decode_gif(MM.encode_gif(4, 4, pal, [0, 1, 2, 3] * 4)[:-8])


def test_gif_spark_decode_matches_local(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 16).select(F.col("id").alias("doc_id"))
    st = {r["doc_id"]: r for r in MM.gif_decode_stats(MM.synth_gif_payloads(docs)).collect()}
    for d in range(16):
        w, h = MM.gif_fixture_params(d)
        idx = [(d * 2654435761 + j * 48271) % 256 for j in range(w * h)]
        luma = [
            sum((d * 2654435761 + (i * 3 + c) * 40503) % 256 for c in range(3))
            for i in idx
        ]
        r = st[d]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_index"] == sum(idx) / len(idx)
        assert r["max_index"] == max(idx)
        assert r["mean_luma"] == sum(luma) / len(luma)


# -- G.711 µ-law / A-law ------------------------------------------------------


def test_g711_expansion_reference_points_and_symmetry():
    # spec reference points (16-bit-scaled tables, the SoX/ffmpeg
    # convention): quiet codes decode to 0 / ±8, loudest to ±32124
    assert MM.ulaw_to_linear(0xFF) == 0
    assert MM.ulaw_to_linear(0x7F) == 0
    assert abs(MM.alaw_to_linear(0xD5)) == 8  # A-law "zero" magnitude
    assert MM.ulaw_to_linear(0x80) == 32124  # loudest positive
    assert MM.ulaw_to_linear(0x00) == -32124
    assert max(abs(MM.alaw_to_linear(b)) for b in range(256)) == 32256
    # sign symmetry across bit 7
    for b in range(128):
        assert MM.ulaw_to_linear(b) == -MM.ulaw_to_linear(b | 0x80)
        assert MM.alaw_to_linear(b | 0x80) == -MM.alaw_to_linear(b)
    # µ-law magnitudes are monotone within a sign half (decreasing code
    # value = increasing magnitude after complement)
    mags = [abs(MM.ulaw_to_linear(b)) for b in range(128)]
    assert mags == sorted(mags, reverse=True)


def test_g711_wav_container_roundtrip_both_laws(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    g711 = MM.synth_g711_payloads(docs)
    st = {r["doc_id"]: r for r in MM.wav_decode_stats(g711).collect()}
    for d in range(10):
        n = 40 + d % 60
        raw = [(d * 2654435761 + j * 40503) % 256 for j in range(n)]
        expand = MM.ulaw_to_linear if d % 2 == 0 else MM.alaw_to_linear
        exp = [expand(b) for b in raw]
        r = st[d]
        assert r["bits"] == 8 and r["n_samples"] == n
        assert r["mean_amp"] == sum(exp) / n
        assert r["peak_amp"] == max(abs(v) for v in exp)


def test_g711_rejects_wrong_width():
    import pytest
    import struct

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 16)  # µ-law @16 bits
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x01")
    with pytest.raises(ValueError, match="8-bit"):
        MM.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_jpeg_batched_idct_matches_per_block_reference():
    """Round 6 rewrote the entropy decode (16-bit-peek LUT tables) and
    batched the IDCT (one einsum-shaped pass per component). This pins
    the new path block-by-block against the retained per-block
    reference `_jpeg_idct_block` on DENSE arbitrary coefficients (all
    64 zigzag positions populated — far beyond the sparse closed-form
    fixtures), so a LUT mis-decode or a batching/placement slip cannot
    hide behind the fixture's exact-basis structure."""
    import numpy as np

    w = h = 16  # 2x2 blocks, grayscale, no cropping
    rng = [(doc * 2654435761 + j * 40503) % 13 - 6 for doc in (3,) for j in range(4 * 64)]
    blocks = [rng[k * 64 : (k + 1) * 64] for k in range(4)]
    payload = MM.encode_jpeg_blocks(w, h, blocks)
    st = MM.decode_jpeg(payload)
    got = np.frombuffer(st["pixels"], dtype=np.uint8).reshape(h, w)
    q = MM._jpeg_fixture_quant()
    for k, zz in enumerate(blocks):
        by, bx = divmod(k, 2)
        ref = MM._jpeg_idct_block(list(zz), q)
        assert (got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == ref).all(), k


def test_jpeg_lut_decoder_rejects_invalid_code_and_marker_cut():
    """The LUT reader's failure modes: a bit pattern outside the coded
    space raises (len-0 LUT entry); scan data cut mid-MCU by the EOI
    raises truncation, never returns short pixels."""
    import pytest

    w, h, ch, payload = _jpeg_fixture(4)
    # the fixture AC table uses only 8-bit codes; a run of 8 zero bits
    # after SOS start decodes the DC fine but derails AC eventually —
    # instead, surgically blank the entropy segment to all-zero bytes
    # (an 8-zero-bits prefix is not a defined fixture DC code: DC codes
    # are 4-bit 0..11, so 0b0000 IS code 0 — use 0xFF-free garbage that
    # forms code 12+ prefixes: 0b1100... = symbols beyond HUFFVAL)
    i = payload.rindex(b"\xff\xd9")
    sos = payload.index(b"\xff\xda")
    ln = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    start = sos + 2 + ln
    bad = payload[:start] + b"\xfe" * (i - start) + payload[i:]
    with pytest.raises(ValueError):
        MM.decode_jpeg(bad)
    # cut INSIDE the entropy segment (keep EOI absent entirely)
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_jpeg(payload[: start + 1])


# -- MJPEG-in-AVI (RIFF container + baseline JPEG frames) -------------------


def _mjpeg_fixture(doc_id):
    w, h, nf, fps = MM.mjpeg_fixture_params(doc_id)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    frames = [
        MM.encode_jpeg_blocks(
            w,
            h,
            [MM._jpeg_fixture_zz(doc_id * 131 + f, k) for k in range(bw_ * bh_)],
        )
        for f in range(nf)
    ]
    return w, h, nf, fps, frames, MM.encode_mjpeg_avi(w, h, frames, fps)


def test_mjpeg_avi_roundtrip_matches_per_frame_jpeg_decode():
    """Container walk + frame extraction: every sampled frame's stats
    equal a direct decode_jpeg of the same stream, at every sampling
    stride, with fps carried from strh scale/rate."""
    for d in (0, 1, 4, 7):
        w, h, nf, fps, frames, avi = _mjpeg_fixture(d)
        for every in (1, 2, 3):
            st = MM.decode_mjpeg_frames(avi, every=every)
            assert (st["width"], st["height"]) == (w, h)
            assert (st["fps_num"], st["fps_den"]) == (fps, 1)
            assert st["n_frames"] == nf
            assert [fi for fi, _, _ in st["frames"]] == list(
                range(0, nf, every)
            )
            for fi, c0_sum, c0_max in st["frames"]:
                px = MM.decode_jpeg(frames[fi])["pixels"]
                assert (c0_sum, c0_max) == (sum(px), max(px))


def test_mjpeg_avi_rejects_truncation_and_wrong_codec():
    import pytest

    w, h, nf, fps, frames, avi = _mjpeg_fixture(3)
    with pytest.raises(ValueError, match="RIFF AVI"):
        MM.decode_mjpeg_frames(b"RIFX" + avi[4:])
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_mjpeg_frames(avi[: len(avi) // 2])  # cut inside movi
    # declared RIFF size larger than the actual payload
    import struct

    big = avi[:4] + struct.pack("<I", len(avi) + 100) + avi[8:]
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_mjpeg_frames(big)
    # a non-MJPG stream (both strh handler and strf biCompression
    # patched to cvid) must refuse rather than feed decode_jpeg garbage
    other = avi.replace(b"MJPG", b"cvid")
    with pytest.raises(ValueError, match="MJPG"):
        MM.decode_mjpeg_frames(other)


def test_mjpeg_avi_rejects_header_frame_dimension_mismatch():
    import pytest
    import struct

    w, h, nf, fps, frames, avi = _mjpeg_fixture(2)
    # lie in avih/strf: container says width+8
    i = avi.index(b"avih") + 8
    patched = (
        avi[: i + 32] + struct.pack("<I", w + 8) + avi[i + 36 :]
    )
    with pytest.raises(ValueError, match="container says"):
        MM.decode_mjpeg_frames(patched)


def test_mjpeg_spark_frame_sample_matches_local(spark):
    """Spark plumbing: synth payloads + frame sampling over a real
    mapInPandas run equals the local decoder per doc/frame."""
    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    rows = MM.mjpeg_frame_sample(
        MM.synth_mjpeg_payloads(docs), every=2
    ).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(24):
        w, h, nf, fps, frames, avi = _mjpeg_fixture(d)
        st = MM.decode_mjpeg_frames(avi, every=2)
        got = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        assert len(got) == len(st["frames"])
        for r, (fi, c0_sum, c0_max) in zip(got, st["frames"]):
            assert r["frame_idx"] == fi
            assert r["frame_ts_ms"] == fi * 1000 // fps
            assert r["max_c0"] == c0_max
            assert abs(r["mean_c0"] - c0_sum / (w * h)) < 1e-12
