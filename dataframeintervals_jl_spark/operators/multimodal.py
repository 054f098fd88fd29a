"""Multimodal (image/audio/video) column plumbing.

Engine extension beyond the reference (SURVEY.md §2.C: the reference
has no scalar functions, let alone media).  Design for 100 TB:

- media rides in OPAQUE ``binary`` columns next to a typed metadata
  struct (:data:`MEDIA_META_DDL`) — Spark shuffles/spills binary fine,
  and column pruning means interval/metadata queries never deserialize
  the payload;
- decode / feature-extract run in ``mapInPandas`` (Arrow-batched, one
  Python worker per partition, streaming iterator so a partition never
  fully materializes) — the ONLY sanctioned Python hot path in the
  engine;
- partitioning guidance: media tables should be written with
  ``maxRecordsPerFile`` tuned so file ≈ HDFS-block sized despite fat
  rows; decode stages should ``repartition`` by a cheap key first when
  upstream produced skewed partition byte-sizes.

DECODE IS A DETERMINISTIC FAKE.  This container has no PIL/librosa/ffmpeg,
so ``_fake_decode_*`` derive metadata and features from the bytes
themselves (documented formulas, reproducible cross-engine).  A real
deployment replaces ONLY the body of those two functions — schema,
batching, partitioning and UDF signatures are the real, tested plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried alongside every media binary column
MEDIA_META_DDL = (
    "struct<kind: string, width: int, height: int, "
    "sample_rate: int, n_frames: int>"
)

FEATURE_DIM = 8

DECODE_SCHEMA_DDL = (
    "id bigint, kind string, n_bytes bigint, width int, height int, n_frames int"
)
FEATURE_SCHEMA_DDL = "id bigint, feature array<float>"


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: the driver's ``documents`` table as a media table
    ``(id, media: binary, meta)`` — utf-8 bytes standing in for encoded
    media so the plumbing runs against real testdata."""
    media = F.encode(F.col("text"), "utf-8")
    n = F.octet_length(media)
    return docs.select(
        F.col("doc_id").alias("id"),
        media.alias("media"),
        F.struct(
            F.lit(kind).alias("kind"),
            _fake_width(n).alias("width"),
            _fake_height(n).alias("height"),
            F.lit(16000).alias("sample_rate"),
            _fake_n_frames(n).alias("n_frames"),
        ).cast(MEDIA_META_DDL).alias("meta"),
    )


# --- deterministic fake decode formulas (SQL-expressible on purpose, so
# --- the DuckDB oracle can check the metadata path end-to-end) -------------


def _fake_width(n_bytes):
    return (F.lit(64) + F.pmod(n_bytes.cast("long"), F.lit(193))).cast("int")


def _fake_height(n_bytes):
    # exact integer n//193 (byte counts are far below 2^53, but stay
    # integral anyway): (n - n%193)/193
    n = n_bytes.cast("long")
    div = ((n - F.pmod(n, F.lit(193))) / F.lit(193)).cast("long")
    return (F.lit(64) + F.pmod(div, F.lit(157))).cast("int")


def _fake_n_frames(n_bytes):
    return (F.lit(1) + F.pmod(n_bytes.cast("long"), F.lit(7))).cast("int")


def _fake_decode_meta(buf: bytes, kind: str) -> tuple:
    """Python twin of the formulas above (used inside mapInPandas)."""
    n = len(buf)
    return n, 64 + n % 193, 64 + (n // 193) % 157, 1 + n % 7


def _fake_decode_feature(buf: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-float vector from the content digest.

    Stand-in for a real encoder embedding; md5 → 8 uint16 → [0, 1)."""
    d = hashlib.md5(buf).digest()
    return (
        np.frombuffer(d, dtype=np.uint16).astype(np.float32) / np.float32(65536.0)
    )[:FEATURE_DIM]


def decode_media_meta(media_df: DataFrame, decode_fn=None) -> DataFrame:
    """Per-item decoded header info via Arrow-batched mapInPandas.

    Input: ``(id, media binary, meta)``; output rows follow
    :data:`DECODE_SCHEMA_DDL`.  The iterator-of-batches signature means
    a 512 MB partition of fat rows streams through the Python worker in
    Arrow-sized chunks instead of materializing.

    ``decode_fn`` is the PLUGGABLE real-codec hook: a picklable
    callable ``(buf: bytes, kind: str) -> (n_bytes, width, height,
    n_frames)`` shipped to the executors (e.g. wrap PIL/ffprobe).  It
    must be pure per item and return exactly 4 ints — a wrong arity
    fails fast with the offending id rather than silently mis-aligning
    columns.  Default: the container's deterministic fake
    (:func:`_fake_decode_meta`); the schema, batching and partitioning
    are identical either way, so a deployment swaps codecs without
    engine changes (pytest validates a real raw-buffer decoder against
    :func:`resize_raw`'s layout contract)."""
    fn = decode_fn or _fake_decode_meta

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = []
            for rid, buf, kind in zip(pdf["id"], pdf["media"], pdf["kind"]):
                row = tuple(fn(buf, kind))
                if len(row) != 4:
                    raise ValueError(
                        f"decode_media_meta: decode_fn returned "
                        f"{len(row)} values for id={rid}, expected 4 "
                        "(n_bytes, width, height, n_frames)"
                    )
                decoded.append(row)
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "id", pdf["id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    slim = media_df.select("id", F.col("meta.kind").alias("kind"), "media")
    return slim.mapInPandas(decode, DECODE_SCHEMA_DDL)


def extract_features(media_df: DataFrame, feature_fn=None) -> DataFrame:
    """Per-item feature vectors (``array<float>``, FEATURE_DIM) via
    mapInPandas — the plumbing a real encoder model would use.

    ``feature_fn`` is the PLUGGABLE encoder hook: a picklable callable
    ``(buf: bytes) -> sequence[float]`` of EXACTLY
    :data:`FEATURE_DIM` floats per item (batch your model inside it if
    it benefits — the callable sees one buffer, the worker already
    amortizes process startup across the Arrow chunk).  Wrong
    dimensionality fails fast with the offending id — a ragged
    feature column poisons every downstream ANN index.  Default: the
    deterministic digest fake (:func:`_fake_decode_feature`)."""
    fn = feature_fn or _fake_decode_feature

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for rid, buf in zip(pdf["id"], pdf["media"]):
                vec = list(fn(buf))
                if len(vec) != FEATURE_DIM:
                    raise ValueError(
                        f"extract_features: feature_fn returned "
                        f"{len(vec)} floats for id={rid}, expected "
                        f"{FEATURE_DIM}"
                    )
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {"id": pdf["id"].values, "feature": feats}
            )

    return media_df.select("id", "media").mapInPandas(featurize, FEATURE_SCHEMA_DDL)


RESIZE_SCHEMA_DDL = "id bigint, media binary, width int, height int"


def resize_raw(
    media_df: DataFrame, width: int, height: int, channels: int = 3
) -> DataFrame:
    """REAL image resize for RAW (uncompressed) frame buffers — the
    tensor layout a decode stage hands downstream: each ``media``
    binary is interpreted as a ``meta.height × meta.width × channels``
    uint8 array and resampled to ``height × width`` by NEAREST-NEIGHBOR
    index gather in numpy (two integer index vectors + one fancy-index
    — vectorized, no per-pixel Python), inside the same Arrow-batched
    ``mapInPandas`` plumbing as :func:`extract_features`.  No codec
    library needed, so unlike :func:`resize_stub` this RUNS here.

    A buffer whose length does not equal ``meta.height · meta.width ·
    channels`` raises with the offending id (fail-fast: silently
    skipping or padding corrupt rows is how bad media poisons a
    training set).  Output: :data:`RESIZE_SCHEMA_DDL` — the resized
    raw buffer plus its new dims.

    Scale shape: map-only (zero shuffles); the worker streams
    Arrow-sized chunks, each row costing O(out_pixels · channels)."""
    if width <= 0 or height <= 0 or channels <= 0:
        raise ValueError(
            f"width/height/channels must be positive, got "
            f"{width}x{height}x{channels}"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_cache: dict = {}

        def idx(n_out: int, n_in: int) -> np.ndarray:
            # source index per output position: floor(i * n_in / n_out)
            key = (n_out, n_in)
            if key not in idx_cache:
                idx_cache[key] = (np.arange(n_out) * n_in) // n_out
            return idx_cache[key]

        for pdf in batches:
            out = []
            for rid, buf, w0, h0 in zip(
                pdf["id"], pdf["media"], pdf["w0"], pdf["h0"]
            ):
                w0, h0 = int(w0), int(h0)
                if len(buf) != w0 * h0 * channels:
                    raise ValueError(
                        f"resize_raw: media for id={rid} has {len(buf)} "
                        f"bytes, expected {w0}x{h0}x{channels}="
                        f"{w0 * h0 * channels} (raw uint8 HWC layout)"
                    )
                a = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    h0, w0, channels
                )
                out.append(a[idx(height, h0)][:, idx(width, w0)].tobytes())
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "media": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    slim = media_df.select(
        "id",
        "media",
        F.col("meta.width").alias("w0"),
        F.col("meta.height").alias("h0"),
    )
    return slim.mapInPandas(resize, RESIZE_SCHEMA_DDL)


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize for CODEC-ENCODED media (jpeg/png/...) — NOT IMPLEMENTED
    in this container (no PIL/opencv to decode the container format).

    Raises eagerly so callers fail fast.  For RAW frame buffers the
    engine has a real, runnable implementation — :func:`resize_raw`
    (pure-numpy nearest-neighbor in the same Arrow plumbing); a real
    deployment implements this function as decode → resize_raw's
    gather → re-encode."""
    raise NotImplementedError(
        "resize of codec-encoded media requires an image codec "
        "(PIL/opencv) not present in this environment; RAW frame "
        "buffers resize for real via resize_raw()"
    )


def sample_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-kind media: one row per sampled frame
    index, ``(id, frame_idx)`` — the explode side of a video pipeline.
    Frame COUNT comes from metadata, so this stays expression-only
    (no decode); pair with a decode UDF to materialize pixels."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")
    return media_df.select(
        "id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


PCM_RESAMPLE_SCHEMA_DDL = (
    "id bigint, media binary, sample_rate int, n_samples bigint"
)
PCM_STATS_SCHEMA_DDL = (
    "id bigint, n_samples bigint, peak int, rms int, n_clipped bigint"
)


def resample_pcm_raw(media_df: DataFrame, out_rate: int) -> DataFrame:
    """REAL audio resample for RAW int16 mono PCM buffers — the audio
    twin of :func:`resize_raw` (and like it, codec-free, so it RUNS
    here: a real deployment puts an ffmpeg/soundfile decode in front).
    Each ``media`` binary is little-endian int16 mono at
    ``meta.sample_rate``; output is the NEAREST-NEIGHBOR index gather
    to ``out_rate`` (source index ``floor(i·in_rate/out_rate)`` — one
    integer index vector + one fancy-index, no per-sample Python).

    Odd byte lengths raise with the offending id (fail-fast, the
    :func:`resize_raw` contract).  Output:
    :data:`PCM_RESAMPLE_SCHEMA_DDL`.  Map-only, zero shuffles;
    Arrow-sized chunks stream through the worker."""
    if out_rate <= 0:
        raise ValueError(f"out_rate must be positive, got {out_rate}")

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, n_out = [], []
            for rid, buf, rate in zip(pdf["id"], pdf["media"], pdf["rate"]):
                if len(buf) % 2:
                    raise ValueError(
                        f"resample_pcm_raw: media for id={rid} has odd "
                        f"length {len(buf)} (raw int16 mono PCM expected)"
                    )
                x = np.frombuffer(bytes(buf), dtype="<i2")
                n_in, rate = len(x), int(rate)
                n = (n_in * out_rate) // rate if rate else 0
                idx = (np.arange(n) * rate) // out_rate
                y = x[idx] if n else x[:0]
                out.append(y.tobytes())
                n_out.append(len(y))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "media": out,
                    "sample_rate": np.int32(out_rate),
                    "n_samples": np.array(n_out, dtype=np.int64),
                }
            )

    slim = media_df.select(
        "id", "media", F.col("meta.sample_rate").alias("rate")
    )
    return slim.mapInPandas(resample, PCM_RESAMPLE_SCHEMA_DDL)


def pcm_stats(media_df: DataFrame, clip_at: int = 32700) -> DataFrame:
    """Per-item loudness/quality stats over RAW int16 mono PCM: sample
    count, peak |amplitude|, integer RMS (``isqrt(Σx² DIV n)`` — exact,
    no libm), and the count of near-clipped samples (|x| >= clip_at) —
    the audio analog of the text quality gates, used to drop silent or
    clipped recordings before training.  Σx² stays inside int64 up to
    ~8.6e9 samples/item (≈50 hours at 48 kHz).  Map-only; output
    :data:`PCM_STATS_SCHEMA_DDL`."""
    import math

    if clip_at <= 0:
        raise ValueError(f"clip_at must be positive, got {clip_at}")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, peak, rms, ncl = [], [], [], []
            for rid, buf in zip(pdf["id"], pdf["media"]):
                if len(buf) % 2:
                    raise ValueError(
                        f"pcm_stats: media for id={rid} has odd length "
                        f"{len(buf)} (raw int16 mono PCM expected)"
                    )
                x = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                n = len(x)
                ns.append(n)
                peak.append(int(np.abs(x).max()) if n else 0)
                energy = int((x * x).sum())
                rms.append(math.isqrt(energy // n) if n else 0)
                ncl.append(int((np.abs(x) >= clip_at).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "n_samples": np.array(ns, dtype=np.int64),
                    "peak": np.array(peak, dtype=np.int32),
                    "rms": np.array(rms, dtype=np.int32),
                    "n_clipped": np.array(ncl, dtype=np.int64),
                }
            )

    return media_df.select("id", "media").mapInPandas(
        stats, PCM_STATS_SCHEMA_DDL
    )
