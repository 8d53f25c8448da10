"""Multimodal columns (BASELINE.md training-data extension).

Image / audio / video ride through the engine as opaque ``binary``
columns with a typed metadata struct — the pattern that scales to
100 TB because Spark never interprets the payload until a Pandas UDF
asks it to:

- storage: Parquet binary + struct (columnar, dictionary-encodable
  metadata, payload pages compressed independently);
- partitioning: media rows are FAT — size partitions by bytes, not
  rows (``repartition_for_payload``), or scans OOM on 10 MB videos
  long before row counts look large;
- compute: decode / feature-extract / resize / frame-sample are
  ``mapInPandas`` stages — Arrow moves the bytes zero-copy into
  Python once per batch, not per row.

COMPRESSED codecs (PIL/libsndfile/ffmpeg for JPEG/PNG/MP3/video) are
NOT in this environment, so those paths stay gated: with
``use_real_codec=True`` on a non-BMP payload ``decode_image`` raises
``NotImplementedError`` unless PIL is importable. UNCOMPRESSED
containers need no external codec: :func:`decode_bmp` /
:func:`encode_bmp` (24/32-bit BI_RGB, top-down or bottom-up,
stride-padded — the Windows BITMAPINFOHEADER public spec) and
:func:`decode_wav` / :func:`encode_wav` (RIFF/WAVE chunk walk,
16-bit PCM) are pure numpy + struct, so the REAL decode path runs
end-to-end in this environment for those formats —
``decode_image(..., use_real_codec=True)`` sniffs the ``BM`` magic
and decodes BMP natively before falling back to PIL. The default
remains the **deterministic fake decoder** (content-hash-seeded
pixels) so driver queries stay oracle-stable; the q53/q102 payloads
are hash-chain/raw-PCM synthetic, not containers.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-table schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

#: target bytes per task when repartitioning fat binary rows
PAYLOAD_PARTITION_BYTES = 128 * 1024 * 1024


def repartition_for_payload(df: DataFrame, avg_row_bytes: int) -> DataFrame:
    """Size partitions by PAYLOAD bytes (≈128 MB/task), not row count
    — the knob that keeps a video table from putting 10 000 × 10 MB
    rows in one task. Uses a count job; pass a known estimate at
    scale to skip it."""
    rows_per_part = max(1, PAYLOAD_PARTITION_BYTES // max(1, avg_row_bytes))
    n = max(1, df.count() // rows_per_part)
    return df.repartition(int(n))


def decode_bmp(content: bytes) -> np.ndarray:
    """Pure-numpy BMP decoder (public BITMAPFILEHEADER +
    BITMAPINFOHEADER spec): 24- or 32-bit uncompressed BI_RGB,
    bottom-up (positive height) or top-down (negative), rows padded
    to 4-byte strides, BGR(A) byte order → (h, w, 3) uint8 RGB.
    Needs no external codec, so the REAL decode path of
    :func:`decode_image` is exercisable in codec-free environments.
    Compressed/paletted BMPs raise ``NotImplementedError`` (they need
    a real imaging library)."""
    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", content, 10)
    (header_size,) = struct.unpack_from("<I", content, 14)
    if header_size < 40:
        raise NotImplementedError(
            "BITMAPCOREHEADER BMPs are not supported"
        )
    if offset < 14 + header_size:
        # a corrupt bfOffBits inside the headers would silently
        # decode header bytes as pixels (r8 review)
        raise ValueError(
            f"invalid BMP pixel offset {offset} (headers end at "
            f"{14 + header_size})"
        )
    w, h = struct.unpack_from("<ii", content, 18)
    (bpp,) = struct.unpack_from("<H", content, 28)
    (compression,) = struct.unpack_from("<I", content, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BI_RGB supported "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down, height = h < 0, abs(h)
    if w <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4
    if offset + stride * height > len(content):
        raise ValueError(
            f"truncated BMP payload: need {offset + stride * height}"
            f" bytes, have {len(content)}"
        )
    buf = np.frombuffer(
        content, np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)
    px = buf[:, : w * nb].reshape(height, w, nb)
    rgb = px[..., [2, 1, 0]]  # stored BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Pure-struct BMP writer (24-bit BI_RGB, bottom-up, stride
    padded): the sink twin of :func:`decode_bmp`, used by the
    round-trip units and by callers exporting decoded frames without
    an imaging library."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[..., [2, 1, 0]].reshape(h, w * 3)  # RGB->BGR
    pixels = rows[::-1].tobytes()  # bottom-up
    file_header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Pure-struct RIFF/WAVE parser for 16-bit PCM: walks the chunk
    list (chunks pad to even offsets), requires ``fmt`` audio format
    1 with 16 bits/sample, and returns ``((n_frames, channels) int16,
    sample_rate)``. Compressed formats raise ``NotImplementedError``
    (they need libsndfile).

    Deliberately NOT the stdlib ``wave`` module: this parser keeps
    the operator contract's exception types (``ValueError`` /
    ``NotImplementedError``, never ``wave.Error``) so mapInPandas
    failures stay diagnosable, and its lenient behaviors are pinned
    by tests as part of the contract — a declared data size larger
    than the payload truncates to whole frames (matching the raw-PCM
    path's convention), and unknown chunks are skipped with even
    padding."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"malformed WAV fmt chunk ({len(body)} bytes)"
                )
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    if channels < 1:
        raise ValueError("malformed WAV: zero channels")
    pcm = np.frombuffer(
        data[: len(data) // (2 * channels) * 2 * channels], dtype="<i2"
    )
    return pcm.reshape(-1, channels), sample_rate


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Canonical 44-byte-header 16-bit PCM WAV writer, the sink twin
    of :func:`decode_wav`. ``pcm``: (n,) or (n, channels) int16."""
    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    channels = pcm.shape[1]
    data = pcm.tobytes()
    block = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_image(
    content: bytes, use_real_codec: bool = False
) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 array.

    Real path: BMP payloads (``BM`` magic) decode natively via
    :func:`decode_bmp` — no external codec; anything else needs PIL
    (absent here → ``NotImplementedError``). The fake path is a
    deterministic pseudo-image seeded by the content hash — stable
    across runs/executors, so tests can assert exact features.

    The fake pixel stream is an md5 hash chain, NOT a PRNG: byte
    block ``i`` is ``md5(f"{md5(content).hexdigest()}-{i}")``.  The
    same chain is expressible in ANSI SQL (md5 + substr + hex cast),
    which is what lets the q53 driver query carry a full DuckDB
    oracle instead of a rows-only check.
    """
    if use_real_codec:
        if content[:2] == b"BM":
            try:
                return decode_bmp(content)
            except (NotImplementedError, ValueError):
                # paletted/RLE/core-header variants AND malformed-
                # but-BM-magic payloads (truncated padding, corrupt
                # offsets, non-BMP bytes starting 'BM') fall through
                # to PIL, which decodes or rejects them where it
                # exists; PIL-absent, the gate below reports the
                # contract's NotImplementedError
                pass
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real decoding of this payload requires PIL, which "
                "is not available in this environment; uncompressed "
                "24/32-bit BMP decodes natively (decode_bmp), or use "
                "the deterministic fake decoder (use_real_codec=False)"
            ) from exc
        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    seed_hex = hashlib.md5(content).hexdigest()
    seed = int(seed_hex[:8], 16)
    h, w = 8 + seed % 8, 8 + (seed >> 4) % 8
    n = h * w * 3
    stream = b"".join(
        hashlib.md5(f"{seed_hex}-{i}".encode()).digest()
        for i in range((n + 15) // 16)
    )
    return (
        np.frombuffer(stream[:n], dtype=np.uint8).reshape(h, w, 3).copy()
    )


IMAGE_FEATURE_SCHEMA = (
    "media_id long, height int, width int, mean_r double, mean_g double,"
    " mean_b double, brightness double"
)


def extract_image_features(
    df: DataFrame, use_real_codec: bool = False
) -> DataFrame:
    """Per-image channel statistics via ``mapInPandas``: one Arrow
    batch in, one feature frame out — the payload never leaves the
    executor, only ~40 bytes of features shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                # NULL payload -> empty bytes, same convention as
                # the audio path (decode_image md5-seeds from b'')
                raw = bytes(content) if content is not None else b""
                arr = decode_image(raw, use_real_codec)
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "media_id": int(mid),
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "brightness": float(means.mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "height", "width", "mean_r", "mean_g",
                "mean_b", "brightness",
            ])

    return df.select("media_id", "content").mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


IMAGE_CHECKSUM_SCHEMA = (
    "media_id long, height int, width int, sum_r long, sum_g long,"
    " sum_b long"
)


def image_channel_sums(
    df: DataFrame, use_real_codec: bool = False
) -> DataFrame:
    """Integer per-channel pixel sums via ``mapInPandas`` — the
    oracle-friendly twin of :func:`extract_image_features`: all-integer
    outputs are bit-exact across engines (no float mean / rounding
    mode to disagree on), so the decode → Arrow batch → feature
    shuffle path gets a HARD value-hash check from the driver (q53).
    Means are ``sum / (height*width)`` when a caller wants them."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                # NULL payload -> empty bytes, same convention as
                # the audio path (decode_image md5-seeds from b'')
                raw = bytes(content) if content is not None else b""
                arr = decode_image(raw, use_real_codec)
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "sum_r": int(sums[0]),
                        "sum_g": int(sums[1]),
                        "sum_b": int(sums[2]),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "height", "width", "sum_r", "sum_g", "sum_b",
            ])

    return df.select("media_id", "content").mapInPandas(
        run, IMAGE_CHECKSUM_SCHEMA
    )


RESIZED_SCHEMA = "media_id long, height int, width int, content binary"


def resize_images(
    df: DataFrame, out_h: int, out_w: int, use_real_codec: bool = False
) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w); output payload is
    the raw RGB buffer. Same mapInPandas shape as feature extraction
    — decode stays stubbed, the resize math and plumbing are real."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                # NULL payload -> empty bytes, same convention as
                # the audio path (decode_image md5-seeds from b'')
                raw = bytes(content) if content is not None else b""
                arr = decode_image(raw, use_real_codec)
                ys = (np.arange(out_h) * arr.shape[0] // out_h).clip(0, arr.shape[0] - 1)
                xs = (np.arange(out_w) * arr.shape[1] // out_w).clip(0, arr.shape[1] - 1)
                resized = arr[ys][:, xs]
                rows.append(
                    {
                        "media_id": int(mid),
                        "height": out_h,
                        "width": out_w,
                        "content": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "content"]
            )

    return df.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def sample_frame_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling PLAN: one row per frame to extract,
    derived from ``meta.duration_ms`` with pure Spark expressions
    (sequence + explode — a generator, no shuffle). The actual frame
    decode would consume this plan in a mapInPandas stage exactly
    like :func:`extract_image_features`; ffmpeg is absent, so that
    stage is :func:`decode_frames`."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
        .withColumn(
            "frame_idx",
            (F.col("frame_ts_ms") / F.lit(every_ms)).cast("int"),
        )
    )


def decode_frames(df: DataFrame) -> DataFrame:
    """STUB: real video frame extraction requires ffmpeg bindings,
    absent in this environment."""
    raise NotImplementedError(
        "video frame decoding requires ffmpeg, not available here; "
        "sample_frame_plan() produces the distributed work plan this "
        "stage would consume"
    )


AUDIO_INT_SCHEMA = "media_id long, n_samples long, sum_abs long, peak long"


def audio_int_stats(df: DataFrame, container: str = "pcm") -> DataFrame:
    """Integer audio statistics over int16 payloads — the
    oracle-friendly twin of :func:`extract_audio_features` (the q53
    pattern: all-integer outputs are bit-exact across engines, so the
    binary → Arrow → Python decode path gets a HARD value-hash check
    from the driver). ``container='pcm'`` (default, q102's contract)
    reads raw little-endian samples, odd trailing bytes truncated
    (``frombuffer`` would otherwise raise); ``container='wav'`` walks
    the RIFF header via :func:`decode_wav` first — the REAL container
    path, runnable here without libsndfile."""

    if container not in ("pcm", "wav"):
        # a typo ('WAV', 'riff') would otherwise silently parse the
        # 44-byte header bytes as samples (r8 review)
        raise ValueError(
            f"unknown audio container {container!r}: use 'pcm' or 'wav'"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                if container == "wav":
                    pcm = (
                        decode_wav(raw)[0].ravel().astype(np.int64)
                        if raw
                        else np.zeros(0, dtype=np.int64)
                    )
                else:
                    pcm = np.frombuffer(
                        raw[: len(raw) // 2 * 2], dtype="<i2"
                    ).astype(np.int64)
                mag = np.abs(pcm)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": len(pcm),
                        "sum_abs": int(mag.sum()) if len(pcm) else 0,
                        "peak": int(mag.max()) if len(pcm) else 0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "sum_abs", "peak"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, AUDIO_INT_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_samples long, rms double, peak double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio features over int16-PCM payloads (RMS/peak). Real codec
    parsing (wav headers etc.) would use libsndfile — absent — so
    payloads are interpreted as raw little-endian PCM, which the test
    synthesizer also emits; the distributed plumbing is identical."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                pcm = np.frombuffer(
                    raw[: len(raw) // 2 * 2], dtype="<i2"
                ).astype(np.float64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": len(pcm),
                        "rms": float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0,
                        "peak": float(np.abs(pcm).max()) if len(pcm) else 0.0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "peak"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )
