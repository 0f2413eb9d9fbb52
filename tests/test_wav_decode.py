"""Pure-spec RIFF/WAVE PCM codec (operators/multimodal.py — VERDICT r3
item 4): the decoder must parse arbitrary spec-conformant WAV files,
not just our fixtures — chunk walking, pad bytes, all PCM widths,
loud failures on non-PCM."""

from __future__ import annotations

import struct

import pytest

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
