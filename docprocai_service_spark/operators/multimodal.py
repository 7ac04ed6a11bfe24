"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque image/audio/video bytes with typed metadata.

The reference does all of this per document with external tools — pdf2image
rasterization (fileextractlib/PdfProcessor.py:34), ffmpeg audio extraction
(fileextractlib/TranscriptGenerator.py:42-55), ffmpeg frame grabs + BMP
demuxing (fileextractlib/VideoProcessor.py:46-81), PIL contrast enhancement
(fileextractlib/VideoProcessor.py:133-135), JPEG re-encode at q93
(service/DocProcAiService.py:123-124). Here the Spark-side plumbing — schema,
Arrow batch shape, mapInPandas signatures, partition behavior — is real and
tested; the actual codec calls are stubbed (this container has no image/audio
libraries) behind STUB markers:

  * decode_image / sample_frames raise NotImplementedError when
    `codec="real"` is requested, and default to a deterministic fake decoder
    (bytes → seeded uint8 array of the metadata's declared dimensions) so
    every downstream op (resize, features) runs on real array data.
  * byte-level features (size, entropy, xxhash-like digest) are REAL — they
    need no codec and are exactly what web-scale pipelines use for cheap
    pre-filters before expensive GPU decode.

At 100 TB: media bytes stay in `binary` columns and are only materialized
inside the Arrow batch being processed (mapInPandas streams batches, bounded
by spark.sql.execution.arrow.maxRecordsPerBatch); metadata lives in a typed
struct so filters (mime, width) prune BEFORE any decode.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def _fake_decode(content: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in for a real image codec: seeds a PCG64 stream
    from the byte content's crc32 → (h, w) uint8 luma plane. STUB — replace
    with e.g. cv2.imdecode on a cluster image."""
    rng = np.random.default_rng(zlib.crc32(content))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image_features(media: DataFrame, codec: str = "stub") -> DataFrame:
    """media → (media_id, mean_luma, std_luma, phash64): decode + extract.

    mapInPandas: one Arrow batch in, one out; the binary column never leaves
    the executor. phash64 is an 8×8 mean-threshold perceptual hash over the
    (fake-)decoded plane — deterministic, so golden-testable.
    """
    if codec == "real":
        raise NotImplementedError("no image codec in this container — STUB only")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_luma": [], "std_luma": [], "phash64": []}
            # zip over columns, not iterrows (which builds a Series per row)
            for media_id, height, width, content in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["content"]
            ):
                h = int(height or 32)
                w = int(width or 32)
                img = _fake_decode(content, h, w)
                if h < 8 or w < 8:
                    # tiny images: tile up to 8×8 so the block reshape is valid
                    img = np.resize(img, (max(h, 8), max(w, 8)))
                    h, w = img.shape
                # 8x8 block means -> threshold at global mean -> 64-bit hash
                bh, bw = max(h // 8, 1), max(w // 8, 1)
                blocks = img[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
                bits = (blocks > blocks.mean()).flatten()
                ph = int(sum(1 << i for i in range(64) if bits[i]))
                out["media_id"].append(media_id)
                out["mean_luma"].append(float(img.mean()))
                out["std_luma"].append(float(img.std()))
                out["phash64"].append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        extract,
        schema="media_id string, mean_luma double, std_luma double, phash64 long",
    )


def resize_images(media: DataFrame, out_h: int, out_w: int, codec: str = "stub") -> DataFrame:
    """media → (media_id, pixels array<int>): decode + nearest-neighbor resize.

    The resize itself is real numpy (runs on the fake-decoded plane); swap the
    decoder to make it production. Demonstrates binary→array columnar output.
    """
    if codec == "real":
        raise NotImplementedError("no image codec in this container — STUB only")

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for media_id, height, width, content in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["content"]
            ):
                h = int(height or 32)
                w = int(width or 32)
                img = _fake_decode(content, h, w)
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                ids.append(media_id)
                pix.append(img[np.ix_(yi, xi)].flatten().astype("int32").tolist())
            yield pd.DataFrame({"media_id": ids, "pixels": pix})

    return media.mapInPandas(rz, schema="media_id string, pixels array<int>")


def sample_frames(media: DataFrame, every_ms: int = 1000, codec: str = "stub") -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_no, ts_ms,
    frame_crc): the ffmpeg `select`-filter frame grab
    (reference: fileextractlib/VideoProcessor.py:46-81) as a flatMap-shaped
    mapInPandas. Frame bytes are deterministic slices of the content blob
    (STUB for a real demuxer); the per-frame crc is real."""
    if codec == "real":
        raise NotImplementedError("no video demuxer in this container — STUB only")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "ts_ms": [], "frame_crc": []}
            for media_id, duration_ms, blob in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["content"]
            ):
                dur = int(duration_ms or 0)
                n = max(dur // every_ms, 1)
                for k in range(n):
                    lo = (k * len(blob)) // n
                    hi = ((k + 1) * len(blob)) // n
                    out["media_id"].append(media_id)
                    out["frame_no"].append(k)
                    out["ts_ms"].append(k * every_ms)
                    out["frame_crc"].append(zlib.crc32(blob[lo:hi]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        frames, schema="media_id string, frame_no int, ts_ms long, frame_crc long"
    )


def pcm_normalize(media: DataFrame, peak: float = 0.95) -> DataFrame:
    """REAL (not stubbed) PCM peak normalization — the reference's audio
    loudness step (reference: fileextractlib/TranscriptGenerator.py:42-55
    resamples/normalizes via ffmpeg before Whisper). Raw 16-bit little-endian
    PCM needs no codec: decode with np.frombuffer, scale so max |sample| hits
    `peak` of full scale, re-encode. Vectorized per row inside the Arrow
    batch; mapInPandas keeps the bytes executor-side.

    Output: (media_id, content binary, peak_before double, scale double).
    """

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        full = 32767.0
        for pdf in batches:
            ids, outs, peaks, scales = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                buf = buf[: len(buf) - (len(buf) % 2)]  # whole int16 samples
                x = np.frombuffer(buf, dtype="<i2").astype(np.float64)
                p = float(np.abs(x).max()) / full if len(x) else 0.0
                s = (peak / p) if p > 0 else 1.0
                y = np.clip(np.rint(x * s), -32768, 32767).astype("<i2")
                ids.append(media_id)
                outs.append(y.tobytes())
                peaks.append(p)
                scales.append(s)
            yield pd.DataFrame(
                {"media_id": ids, "content": outs, "peak_before": peaks, "scale": scales}
            )

    return media.select("media_id", "content").mapInPandas(
        norm, schema="media_id string, content binary, peak_before double, scale double"
    )


def normalize_media(media: DataFrame, target_mime: str = "application/pdf",
                    codec: str = "stub") -> DataFrame:
    """Format normalization dispatch — the reference converts PPTX→PDF before
    extraction (reference: fileextractlib/PowerPointProcessor.py:13-37 via
    LibreOffice). The Spark-side shape is a mime-dispatched mapInPandas:
    rows already in `target_mime` pass through untouched; others run the
    converter (STUB — deterministic container re-wrap: a real deployment swaps
    in the LibreOffice/ffmpeg call). Metadata-first pruning applies: the
    dispatch predicate is on `mime`, so a mime-partitioned table converts only
    the partitions that need it."""
    if codec == "real":
        raise NotImplementedError("no office/media converter in this container — STUB only")

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, outs, converted = [], [], [], []
            for media_id, mime, content in zip(pdf["media_id"], pdf["mime"], pdf["content"]):
                if mime == target_mime:
                    ids.append(media_id); mimes.append(mime)
                    outs.append(bytes(content)); converted.append(False)
                else:
                    # deterministic stand-in conversion: tagged re-wrap so
                    # tests can verify dispatch + payload integrity
                    ids.append(media_id); mimes.append(target_mime)
                    outs.append(b"CONV:" + mime.encode() + b":" + bytes(content))
                    converted.append(True)
            yield pd.DataFrame(
                {"media_id": ids, "mime": mimes, "content": outs, "converted": converted}
            )

    return media.select("media_id", "mime", "content").mapInPandas(
        conv, schema="media_id string, mime string, content binary, converted boolean"
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """Codec-free byte-level features (REAL, not stubbed): size + entropy +
    crc — the cheap pre-filter columns a 100 TB media pipeline computes before
    any GPU decode. Pure JVM where possible (length/crc32), entropy in Arrow."""

    @F.pandas_udf(T.DoubleType())
    def entropy(content: pd.Series) -> pd.Series:
        out = np.empty(len(content))
        for i, b in enumerate(content):
            if not b:
                out[i] = 0.0
                continue
            counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
            p = counts[counts > 0] / len(b)
            out[i] = float(-(p * np.log2(p)).sum())
        return pd.Series(out)

    return media.select(
        "media_id",
        "mime",
        F.length("content").alias("n_bytes"),
        F.crc32("content").alias("crc"),
        entropy(F.col("content")).alias("byte_entropy"),
    )
