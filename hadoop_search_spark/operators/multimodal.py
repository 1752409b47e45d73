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
UDF signature) is real and tested. A REAL image path exists behind
``codec="pil"`` / ``codec="auto"`` (executor-side import-gated, so
this module loads without PIL); audio/video remain stubbed
(librosa/ffmpeg likewise absent). The catalog entry pins the stub
because its oracle reproduces the stub arithmetic exactly.
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
    PIL on executors), or ``"auto"`` (PIL when importable, else the
    stub — probed per executor batch, so a heterogeneous cluster
    degrades batch-by-batch rather than failing the job). The auto
    fallback triggers on PIL's ABSENCE only; a corrupt/undecodable
    payload still fails the decode in both pil and auto modes —
    payload validation/quarantine belongs upstream (the corpus
    connectors' pattern), not silently inside the decoder. The catalog
    entry pins ``"stub"`` because its oracle reproduces the stub
    arithmetic; a corpus of real images would pin ``"pil"`` and lose
    the SQL oracle (nothing else changes — same schema, same plan)."""
    if codec not in ("stub", "pil", "auto"):
        raise ValueError(f"unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if codec == "pil":
                yield _pil_decode_batch(pdf)
            elif codec == "auto":
                try:
                    yield _pil_decode_batch(pdf)
                except ImportError:
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
