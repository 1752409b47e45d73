"""Pure-stdlib PNG codec: encode/decode round-trip, a differential
against spec-side FORWARD filtering (the decoder implements the
inverse), and the Spark decode_media paths that make the image decode
REAL in this PIL-less container."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from hadoop_search_spark.operators.multimodal import (
    _PNG_MAGIC,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("shape", [(7, 5), (6, 4, 3), (3, 9, 4), (5, 3, 2)])
def test_png_round_trip(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    w, h, ch, px = decode_png(encode_png(arr))
    exp = arr if arr.ndim == 3 else arr[:, :, None]
    assert (w, h, ch) == (exp.shape[1], exp.shape[0], exp.shape[2])
    assert px == exp.tobytes()


def _forward_filter(arr, ftypes):
    """Spec-side FORWARD scanline filtering (PNG spec §9) — an
    independent implementation of the direction the decoder must
    invert, one filter type per row."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(int)
    out = b""
    for y, ft in enumerate(ftypes):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        a = np.concatenate([np.zeros(ch, dtype=int), cur[:-ch]])
        c = np.concatenate([np.zeros(ch, dtype=int), prev[:-ch]])
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - a
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            f = cur - (a + prev) // 2
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            f = cur - pred
        out += bytes([ft]) + (f % 256).astype(np.uint8).tobytes()
    return out


def test_png_decoder_inverts_all_five_filters():
    rng = np.random.RandomState(42)
    arr = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    ftypes = [0, 1, 2, 3, 4]
    raw = _forward_filter(arr, ftypes)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (6, 5, 3)
    assert px == arr.tobytes()


def test_png_rejects_unsupported_shapes():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth: rewrite the IHDR of a valid file
    good = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    good[8 + 8 + 8] = 16  # depth byte inside IHDR
    with pytest.raises(NotImplementedError):
        decode_png(bytes(good))


def test_decode_media_png_codec_real_pixels(spark):
    """End-to-end through mapInPandas: image payloads are REAL PNGs,
    decoded dimensions are the true ones and the checksum is the md5
    of the defiltered pixels (content identity — two different
    compressions of the same pixels must agree); audio rows keep the
    stub features. In this PIL-less container codec='auto' must pick
    the pure PNG path for all-PNG image batches."""
    rng = np.random.RandomState(7)
    imgs = {
        1: rng.randint(0, 256, size=(4, 9, 3), dtype=np.uint8),
        2: rng.randint(0, 256, size=(11, 2), dtype=np.uint8),
    }
    rows = [
        (1, "image", bytearray(encode_png(imgs[1])), 1, 0),
        (2, "image", bytearray(encode_png(imgs[2])), 2, 0),
        (3, "audio", bytearray(b"not-an-image"), 3, 0),
    ]
    from hadoop_search_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for codec in ("png", "auto"):
        out = {r.media_id: r for r in decode_media(media, codec=codec).collect()}
        assert (out[1].width, out[1].height) == (9, 4)
        assert (out[2].width, out[2].height) == (2, 11)
        assert out[1].checksum == hashlib.md5(imgs[1].tobytes()).hexdigest()
        assert out[2].checksum == hashlib.md5(imgs[2].tobytes()).hexdigest()
        assert out[1].decoder == out[2].decoder == "png"
        assert out[3].decoder == "stub"
    # recompressing the same pixels (different zlib level) keeps the
    # pixel checksum — the property a payload-bytes hash lacks
    def recompress(png_bytes, level):
        pos, out_parts, idat = 8, [bytes(png_bytes[:8])], b""
        data = bytes(png_bytes)
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IDAT":
                idat += body
                continue
            if tag == b"IEND":
                raw = zlib.compress(zlib.decompress(idat), level)
                out_parts.append(
                    struct.pack(">I", len(raw))
                    + b"IDAT"
                    + raw
                    + struct.pack(">I", zlib.crc32(b"IDAT" + raw) & 0xFFFFFFFF)
                )
            out_parts.append(
                struct.pack(">I", length)
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
        return b"".join(out_parts)

    w1, h1, c1, px1 = decode_png(recompress(encode_png(imgs[1]), 9))
    assert hashlib.md5(px1).hexdigest() == hashlib.md5(imgs[1].tobytes()).hexdigest()


def test_decode_media_png_codec_fails_on_non_png_images(spark):
    from hadoop_search_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"plain text bytes"), 1, 0)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception):
        decode_media(media, codec="png").collect()


def test_wav_round_trip_and_chunk_tolerance():
    """WAV: encode→decode round-trip (mono + stereo), tolerance for
    extra RIFF chunks between fmt and data, and rejection of non-PCM16
    encodings."""
    from hadoop_search_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32768, size=100, dtype=np.int16)
    ch, rate, n, pcm = decode_wav(encode_wav(mono, 8000, 1))
    assert (ch, rate, n) == (1, 8000, 100) and pcm == mono.astype("<i2").tobytes()
    stereo = rng.randint(-32768, 32768, size=60, dtype=np.int16)
    ch, rate, n, pcm = decode_wav(encode_wav(stereo, 44100, 2))
    assert (ch, rate, n) == (2, 44100, 30)

    # insert a LIST chunk before data — a real-world WAV shape
    raw = encode_wav(mono, 8000, 1)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = bytearray(raw[:fmt_end] + extra + raw[fmt_end:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    ch, rate, n, pcm = decode_wav(bytes(patched))
    assert n == 100 and pcm == mono.astype("<i2").tobytes()

    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    bad = bytearray(encode_wav(mono))
    struct.pack_into("<H", bad, 12 + 8, 3)  # audio_format = IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_decode_audio_end_to_end(spark):
    """Spark path: synthesized WAV payloads decode to the
    first-principles features (duration, peak, PCM checksum) with
    decoder='wav' — the audio regime is real, not stubbed."""
    from hadoop_search_spark.operators.multimodal import (
        decode_audio,
        synthesize_wav_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark")], "doc_id LONG, text STRING"
    )
    out = {r.media_id: r for r in decode_audio(synthesize_wav_media(docs)).collect()}
    for doc_id, text in ((1, "hello world"), (2, "spark")):
        d = hashlib.md5(text.encode()).digest()
        vals = struct.unpack("<8h", d)
        r = out[doc_id]
        assert (r.channels, r.sample_rate, r.n_samples, r.duration_ms) == (
            1, 8000, 200, 25,
        )
        assert r.peak == max(abs(v) for v in vals)
        assert r.checksum == hashlib.md5(d * 25).hexdigest()
        assert r.decoder == "wav"


def test_auto_degrades_unsupported_png_shapes_per_row(spark):
    """A palette/16-bit PNG inside an all-PNG batch must not crash
    codec='auto' (PIL absent here): the unsupported ROW degrades to
    the stub features with decoder='stub', supported rows still
    decode for real — the per-row graceful degrade the module
    documents. Explicit codec='png' stays strict and raises."""
    from hadoop_search_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    good = encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    paletted = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    paletted[8 + 8 + 9] = 3  # IHDR colortype -> palette
    rows = [
        (1, "image", bytearray(good), 1, 0),
        (2, "image", paletted, 2, 0),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    out = {r.media_id: r for r in decode_media(media, codec="auto").collect()}
    assert out[1].decoder == "png" and (out[1].width, out[1].height) == (4, 4)
    assert out[2].decoder == "stub"
    with pytest.raises(Exception):
        decode_media(media, codec="png").collect()


def test_mp4_box_walk_round_trip_and_spark_path(spark):
    """ISO-BMFF walker: encode→decode round-trip (incl. a 64-bit mvhd
    v1 variant and unknown-box tolerance), rejection of non-BMFF
    input, and the Spark decode_video_meta path against
    first-principles digest features."""
    from hadoop_search_spark.operators.multimodal import (
        decode_mp4,
        decode_video_meta,
        encode_mp4,
        synthesize_mp4_media,
    )

    payload = encode_mp4(1920, 1080, 123456, b"framedata", timescale=90000)
    assert decode_mp4(payload)[:5] == (1, 90000, 123456, 1920, 1080)
    assert decode_mp4(payload)[5] == b"framedata"

    # unknown top-level box between ftyp and moov is skipped
    extra = struct.pack(">I", 8 + 4) + b"free" + b"xxxx"
    patched = payload[:24] + extra + payload[24:]
    assert decode_mp4(patched)[:5] == (1, 90000, 123456, 1920, 1080)

    with pytest.raises(ValueError):
        decode_mp4(b"RIFFnope")

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark")], "doc_id LONG, text STRING"
    )
    out = {
        r.media_id: r
        for r in decode_video_meta(synthesize_mp4_media(docs)).collect()
    }
    for doc_id, text in ((1, "hello world"), (2, "spark")):
        d = hashlib.md5(text.encode()).digest()
        r = out[doc_id]
        assert r.n_tracks == 1 and r.timescale == 1000
        assert r.duration_ms == int.from_bytes(d[:4], "big") % 100000
        assert (r.width, r.height) == (
            16 * (1 + d[4] % 120),
            16 * (1 + d[5] % 120),
        )
        assert r.checksum == hashlib.md5(d * 4).hexdigest()
        assert r.decoder == "mp4"
