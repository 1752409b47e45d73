"""Multimodal column plumbing (SURVEY.md §7 phase 5).

Media (image/audio/video) is modeled as opaque ``BINARY`` payloads
with typed metadata — the standard large-scale layout (media bytes
inline or as object-store references, transforms as Arrow-batched
functions over ``mapInPandas``).

The default decode is STUBBED: the image/audio libraries are not in
this environment, so ``decode_media(codec="stub")`` computes
deterministic fake features (derived from payload length + md5)
behind the same batch interface a real decoder would use — the
Spark-side plumbing (schema, Arrow batching, partition parallelism,
UDF signature) is real and tested. TWO real image paths exist:
``codec="pil"`` (executor-side import-gated, for clusters that have
PIL) and ``codec="png"`` — a pure-stdlib (zlib/struct/numpy) PNG
codec that RUNS IN THIS CONTAINER, returning true dimensions and a
defiltered-pixel checksum, with an :func:`encode_png` round-trip twin
(both differentially tested against spec-side filtering).
``codec="auto"`` dispatches per batch: PIL → pure PNG (magic-byte
probe) → stub. AUDIO is real too: :func:`decode_audio` walks
RIFF/PCM16 WAV with stdlib struct (true channels/rate/duration/peak +
a PCM checksum), with :func:`encode_wav` as its round-trip twin.
VIDEO is real at the CONTAINER level: :func:`decode_video_meta` walks
ISO-BMFF (MP4) boxes for track count, timescale, duration, declared
dimensions and an mdat checksum — only frame DECODE remains out of
scope (no stdlib video codec; ffmpeg would swap in behind the same
batch interface). The stub catalog entry pins the stub arithmetic;
the ``media_decode_png`` / ``media_decode_wav`` /
``media_decode_mp4`` entries pin the REAL paths against
first-principles golden oracles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "src_doc BIGINT, n_bytes BIGINT"
)

DECODED_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, "
    "width INT, height INT, n_frames INT, checksum STRING, "
    "decoder STRING"
)


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: payload =
    utf-8 bytes of the text (a deterministic stand-in for real media
    bytes), kind assigned round-robin image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.col("doc_id").alias("src_doc"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )


def synthesize_png_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL image payloads without PIL: each doc becomes an 8×8 RGB
    PNG whose pixels are the md5(text) digest bytes tiled (16 bytes ×
    12 = 192 = 8·8·3) — deterministic across runs and engines, so the
    decoded output has a first-principles golden oracle (the expected
    pixel checksum is md5(digest*12), computable without touching the
    codec). Arrow-batched mapInPandas, the same per-item transform
    shape as decode_media."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for t in pdf[text_col]:
                d = hashlib.md5(t.encode("utf-8")).digest()
                arr = np.frombuffer(d * 12, dtype=np.uint8).reshape(8, 8, 3)
                payloads.append(encode_png(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "payload": payloads,
                    "src_doc": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a real decoder. A real implementation
    would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))
        width, height = img.size

    Columnar over the Arrow batch: only the per-item hash (the stand-in
    for the per-item decode) touches Python objects; every derived
    feature is a vectorized frame operation — the template a real
    decoder should follow (decode per item, featurize per column).

    Raises NotImplementedError for kinds a decoder doesn't support,
    exactly as a real one would."""
    bad = ~pdf["kind"].isin(("image", "audio", "video"))
    if bad.any():
        kind = pdf["kind"][bad].iloc[0]
        raise NotImplementedError(f"no decoder for kind {kind!r}")
    digest = pdf["payload"].map(lambda p: hashlib.md5(bytes(p)).hexdigest())
    h = digest.str[:8].map(lambda s: int(s, 16))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "width": (64 + h % 1024).astype("int32"),
            "height": (64 + (h // 1024) % 1024).astype("int32"),
            "n_frames": (1 + (h % 120).where(pdf["kind"] != "image", 0)).astype(
                "int32"
            ),
            "checksum": digest,
            # the regime marker: every decoded row RECORDS which
            # decoder produced it, so the stub/real switch can never
            # flip silently between rounds — it shows up in the data
            # (and therefore in the driver's value hash)
            "decoder": "stub",
        }
    )


def _pil_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real image decode via PIL, same batch contract as the stub:
    images get their true (width, height); audio/video still use the
    deterministic fake features (librosa/ffmpeg are likewise absent).
    Import happens here, EXECUTOR-side — the module must import on
    machines without PIL."""
    import io

    from PIL import Image  # noqa: PLC0415 — executor-side, gated

    out = _fake_decode_batch(pdf)
    is_img = (pdf["kind"] == "image").to_numpy()
    if is_img.any():
        sizes = [
            Image.open(io.BytesIO(bytes(p))).size
            for p in pdf["payload"][is_img]
        ]
        out.loc[is_img, "width"] = pd.array(
            [w for w, _ in sizes], dtype="int32"
        )
        out.loc[is_img, "height"] = pd.array(
            [h for _, h in sizes], dtype="int32"
        )
        # only image rows actually went through PIL; audio/video
        # features are still the deterministic stub
        out.loc[is_img, "decoder"] = "pil"
    return out


# ------------------------------------------------ pure-stdlib PNG codec
#
# PIL is absent from this container, but PNG needs only zlib + struct
# (both stdlib) + numpy for the filter math — so the image path can be
# REAL here, not a stub: true dimensions AND a pixel-level checksum
# (md5 of the defiltered raw pixel bytes — content identity that
# survives re-compression, which a payload-bytes hash does not).
# Supported: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced
# — the shapes a training corpus normalizes to anyway; palette /
# 16-bit / interlaced raise, and the auto path degrades those rows to
# the stub (decoder column says so, per row).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels) -> bytes:
    """Minimal PNG writer (filter 0 rows, one IDAT) for uint8 arrays
    shaped (h, w) or (h, w, ch) with ch in {1, 2, 3, 4} — the
    round-trip twin of :func:`decode_png`, used to synthesize REAL
    image payloads in tests and fixtures without PIL."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Full PNG decode, stdlib + numpy only → (width, height,
    channels, pixel_bytes). Implements all five scanline filters
    (None/Sub/Up/Average/Paeth — the Paeth predictor per the PNG
    spec's integer arithmetic). Raises ValueError on non-PNG input
    and NotImplementedError on palette/16-bit/interlaced files."""
    import struct
    import zlib

    import numpy as np

    if bytes(payload[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    data = bytes(payload)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, colortype, _comp, _filt, interlace = meta
    if depth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG shape (depth={depth}, colortype={colortype}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[colortype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + (a + b) // 2
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[x] + pred
                cur[x] = val & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return w, h, ch, out.tobytes()


def _png_decode_batch(pdf: pd.DataFrame, strict: bool = True) -> pd.DataFrame:
    """Real image decode via the pure-stdlib PNG codec, same batch
    contract as the stub: image rows get true dimensions + a checksum
    of the DEFILTERED PIXELS (content identity across
    re-compressions); audio/video keep the deterministic stub
    features (no stdlib-only codec exists for them).

    ``strict=True`` (the explicit ``codec='png'`` path) propagates
    decode errors; ``strict=False`` (the ``auto`` path) degrades an
    unsupported-SHAPE row (palette/16-bit/interlaced —
    NotImplementedError) to the stub features PER ROW with
    decoder='stub', while truncated/corrupt files (ValueError) still
    raise — graceful degrade is for capability gaps, not data
    corruption."""
    out = _fake_decode_batch(pdf)
    is_img = (pdf["kind"] == "image").to_numpy()
    if is_img.any():
        widths, heights, sums, decs = [], [], [], []
        for p, w0, h0, c0 in zip(
            pdf["payload"][is_img],
            out.loc[is_img, "width"],
            out.loc[is_img, "height"],
            out.loc[is_img, "checksum"],
        ):
            try:
                w, h, _ch, px = decode_png(bytes(p))
                widths.append(w)
                heights.append(h)
                sums.append(hashlib.md5(px).hexdigest())
                decs.append("png")
            except NotImplementedError:
                if strict:
                    raise
                widths.append(w0)
                heights.append(h0)
                sums.append(c0)
                decs.append("stub")
        out.loc[is_img, "width"] = pd.array(widths, dtype="int32")
        out.loc[is_img, "height"] = pd.array(heights, dtype="int32")
        out.loc[is_img, "checksum"] = sums
        out.loc[is_img, "decoder"] = decs
    return out


# ------------------------------------------------ pure-stdlib WAV codec
#
# The audio analogue of the PNG path: RIFF/PCM WAV needs only struct,
# so audio decode is REAL in this librosa-less container — true
# channel count, sample rate, duration, peak amplitude and a checksum
# of the raw PCM samples (content identity independent of header
# cosmetics).

AUDIO_SCHEMA = (
    "media_id BIGINT, channels INT, sample_rate INT, n_samples BIGINT, "
    "duration_ms BIGINT, peak INT, checksum STRING, decoder STRING"
)


def encode_wav(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal PCM16 WAV writer for an int16 sample array (interleaved
    if multi-channel) — the round-trip twin of :func:`decode_wav`."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """PCM16 WAV decode, stdlib-only → (channels, sample_rate,
    n_samples, pcm_bytes). Walks RIFF chunks (tolerating extras like
    LIST/fact), validates the PCM16 format, and returns the raw data
    chunk. Raises ValueError on non-WAV input, NotImplementedError on
    non-PCM16 encodings."""
    import struct

    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format, channels, rate, _brate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"unsupported WAV encoding (format={audio_format}, bits={bits})"
        )
    if block_align != channels * 2 or len(pcm) % block_align:
        raise ValueError("WAV data length inconsistent with block align")
    return channels, rate, len(pcm) // block_align, pcm


def synthesize_wav_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL audio payloads without librosa: each doc becomes a 25 ms
    mono 8 kHz PCM16 WAV whose samples are the md5(text) digest bytes
    tiled ×25 (400 bytes = 200 samples) — deterministic, so the
    decoded output has a first-principles golden oracle (expected
    checksum/peak derive from the digest arithmetic alone)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for t in pdf[text_col]:
                d = hashlib.md5(t.encode("utf-8")).digest()
                samples = np.frombuffer(d * 25, dtype="<i2")
                payloads.append(encode_wav(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "audio",
                    "payload": payloads,
                    "src_doc": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode over mapInPandas: every payload
    must be a PCM16 WAV (the decoder raises otherwise — quarantine
    belongs upstream). duration_ms is integer floor arithmetic
    (n_samples * 1000 // rate) and peak is the max |int16| sample —
    both exact, so a golden oracle reproduces every row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ch, rate, n, pcm = decode_wav(bytes(payload))
                samples = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
                rows.append(
                    (
                        int(mid), ch, rate, n, n * 1000 // rate,
                        int(np.abs(samples).max()) if len(samples) else 0,
                        hashlib.md5(pcm).hexdigest(), "wav",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channels", "sample_rate", "n_samples",
                    "duration_ms", "peak", "checksum", "decoder",
                ],
            ).astype(
                {
                    "media_id": "int64", "channels": "int32",
                    "sample_rate": "int32", "n_samples": "int64",
                    "duration_ms": "int64", "peak": "int32",
                }
            )

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


# ------------------------------------------------ pure-stdlib MP4 walker
#
# Video completes the media trio at the CONTAINER level: ISO-BMFF
# (MP4) box structure needs only struct, so track layout, timescale,
# duration and declared dimensions are REAL here — frame DECODE stays
# out of scope (no stdlib video codec exists; that boundary is the
# honest one, and it is the part a cluster with ffmpeg would swap in
# behind the same batch interface).

VIDEO_SCHEMA = (
    "media_id BIGINT, n_tracks INT, timescale INT, duration_ms BIGINT, "
    "width INT, height INT, checksum STRING, decoder STRING"
)


def encode_mp4(
    width: int,
    height: int,
    duration: int,
    mdat: bytes,
    timescale: int = 1000,
) -> bytes:
    """Minimal ISO-BMFF writer (ftyp + moov[mvhd + trak[tkhd]] + mdat)
    — the round-trip twin of :func:`decode_mp4`, used to synthesize
    REAL container payloads in tests and fixtures without ffmpeg."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">IIIIII", 0x00000007, 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov + box(b"mdat", mdat)


def decode_mp4(payload: bytes):
    """ISO-BMFF container walk, stdlib-only → (n_tracks, timescale,
    duration, width, height, mdat_bytes). Walks top-level boxes
    (tolerating unknown ones), descends into moov for mvhd (v0 or v1)
    and per-trak tkhd; width/height are the FIRST track's declared
    16.16 fixed-point dimensions. Raises ValueError on non-BMFF input
    or a truncated/missing moov."""
    import struct

    data = bytes(payload)

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            if size < 8 or pos + size > hi:
                raise ValueError("malformed BMFF box")
            yield tag, pos + 8, pos + size
            pos += size

    top = list(walk(0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")
    timescale = duration = None
    n_tracks = 0
    width = height = 0
    mdat = b""
    for tag, lo, hi in top:
        if tag == b"moov":
            for t2, l2, h2 in walk(lo, hi):
                if t2 == b"mvhd":
                    ver = data[l2]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", data[l2 + 20 : l2 + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", data[l2 + 12 : l2 + 20]
                        )
                elif t2 == b"trak":
                    n_tracks += 1
                    for t3, l3, h3 in walk(l2, h2):
                        if t3 == b"tkhd" and n_tracks == 1:
                            w16, h16 = struct.unpack(
                                ">II", data[h3 - 8 : h3]
                            )
                            width, height = w16 >> 16, h16 >> 16
        elif tag == b"mdat":
            mdat = data[lo:hi]
    if timescale is None:
        raise ValueError("truncated BMFF (missing moov/mvhd)")
    return n_tracks, timescale, duration, width, height, mdat


def synthesize_mp4_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL video-container payloads without ffmpeg: each doc becomes
    a one-track MP4 whose header fields and mdat derive from md5(text)
    — duration = first 4 digest bytes % 100000 (timescale 1000),
    width/height = 16×(1 + next bytes % 120), mdat = digest×4 — so the
    walked output has a first-principles golden oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for t in pdf[text_col]:
                d = hashlib.md5(t.encode("utf-8")).digest()
                duration = int.from_bytes(d[:4], "big") % 100000
                w = 16 * (1 + d[4] % 120)
                h = 16 * (1 + d[5] % 120)
                payloads.append(encode_mp4(w, h, duration, d * 4))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "video",
                    "payload": payloads,
                    "src_doc": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_video_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL container decode over mapInPandas: every
    payload must be ISO-BMFF. duration_ms is integer floor arithmetic
    (duration * 1000 // timescale); checksum is md5 of the mdat bytes
    (payload identity independent of header cosmetics); decoder='mp4'
    marks the header-real regime (frame decode would be a further
    column set behind the same interface, ffmpeg-gated)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_tracks, ts, dur, w, h, mdat = decode_mp4(bytes(payload))
                rows.append(
                    (
                        int(mid), n_tracks, ts, dur * 1000 // ts, w, h,
                        hashlib.md5(mdat).hexdigest(), "mp4",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_tracks", "timescale", "duration_ms",
                    "width", "height", "checksum", "decoder",
                ],
            ).astype(
                {
                    "media_id": "int64", "n_tracks": "int32",
                    "timescale": "int32", "duration_ms": "int64",
                    "width": "int32", "height": "int32",
                }
            )

    return media.mapInPandas(run, schema=VIDEO_SCHEMA)


_WARNED_AUTO_FALLBACK = False


def _warn_auto_fallback() -> None:
    """Once-per-worker loud notice that codec='auto' degraded to the
    stub. stderr is the executor log channel; the durable signal is
    the per-row ``decoder`` column."""
    global _WARNED_AUTO_FALLBACK
    if not _WARNED_AUTO_FALLBACK:
        _WARNED_AUTO_FALLBACK = True
        import sys

        print(
            "hadoop_search_spark.multimodal: codec='auto' fell back to "
            "the STUB decoder (PIL not importable on this executor); "
            "decoded rows carry decoder='stub'",
            file=sys.stderr,
        )


def decode_media(media: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched decode over ``mapInPandas`` — partition-parallel,
    constant memory per batch; the pattern for any per-item media
    transform (resize, feature-extract, frame-sample) at 100 TB.

    ``codec``: ``"stub"`` (default — deterministic fake features; the
    value-checked oracle path), ``"pil"`` (real image decode, requires
    PIL on executors), ``"png"`` (REAL image decode via the
    pure-stdlib codec — works in THIS container: true dimensions + a
    defiltered-pixel checksum; fails on non-PNG image payloads), or
    ``"auto"`` (per executor batch: PIL if importable, else the pure
    PNG codec if every image payload carries the PNG magic, else the
    stub — so a heterogeneous cluster degrades batch-by-batch rather
    than failing the job). Outside auto, a corrupt/undecodable
    payload still fails the decode — payload validation/quarantine
    belongs upstream (the corpus connectors' pattern), not silently
    inside the decoder; auto's magic-byte probe is format DISPATCH,
    not error swallowing (a bad payload WITH the PNG magic still
    raises). The catalog entry pins ``"stub"`` because its oracle
    reproduces the stub arithmetic; a corpus of real images would pin
    ``"pil"``/``"png"`` and lose the SQL oracle (nothing else changes
    — same schema, same plan)."""
    if codec not in ("stub", "pil", "png", "auto"):
        raise ValueError(f"unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if codec == "pil":
                yield _pil_decode_batch(pdf)
            elif codec == "png":
                yield _png_decode_batch(pdf)
            elif codec == "auto":
                try:
                    yield _pil_decode_batch(pdf)
                except ImportError:
                    imgs = pdf["payload"][pdf["kind"] == "image"]
                    if len(imgs) and all(
                        bytes(p[:8]) == _PNG_MAGIC for p in imgs
                    ):
                        # non-strict: unsupported PNG SHAPES (palette/
                        # 16-bit/interlaced) degrade to the stub per
                        # row; corrupt files still raise
                        yield _png_decode_batch(pdf, strict=False)
                    else:
                        _warn_auto_fallback()
                        yield _fake_decode_batch(pdf)
            else:
                yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Explode videos into sampled frame rows (frame index every
    ``every_n``) — pure Catalyst, no UDF: (media_id, frame_idx)."""
    frames = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
    )
    return (
        decoded.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Byte accounting per kind — the partition-pruning-friendly
    summary a media lakehouse needs."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
