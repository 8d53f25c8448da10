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

External-library codecs (PIL/libsndfile/ffmpeg for JPEG/MP3/video)
are NOT in this environment, so those paths stay gated: with
``use_real_codec=True`` on such a payload ``decode_image`` raises
``NotImplementedError`` unless PIL is importable. Formats with a
fully public, dependency-free spec decode natively: :func:`decode_bmp`
/ :func:`encode_bmp` (24/32-bit BI_RGB, top-down or bottom-up,
stride-padded — the Windows BITMAPINFOHEADER public spec),
:func:`decode_wav` / :func:`encode_wav` (RIFF/WAVE chunk walk,
16-bit PCM) — and, since round 9, COMPRESSED formats:
:func:`decode_png` / :func:`encode_png` (stdlib ``zlib`` inflate +
numpy scanline unfiltering, all five filter types — the W3C PNG
spec), JPEG — baseline AND progressive SOF2 —
(``operators/jpeg_codec.py``: Annex K tables, Huffman entropy
coding, spectral selection + successive approximation, numpy DCT —
ITU-T T.81), and GIF87a/89a (``operators/gif_codec.py``: LSB-first
variable-width LZW, animation compositing, interlacing — the
CompuServe/W3C spec; ``decode_frames`` sniffs GIF vs MJPEG-AVI per
payload).
``decode_image(..., use_real_codec=True)`` sniffs the ``BM`` magic /
PNG signature / JPEG SOI and decodes natively before falling back to
PIL. The default remains the **deterministic fake decoder**
(content-hash-seeded pixels) so driver queries stay oracle-stable;
the q53/q102 payloads are hash-chain/raw-PCM synthetic, not
containers, while q249/q254 round-trip REAL zlib-compressed PNG /
Huffman-coded JPEG containers distributed.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def _bmp_rle_indices(
    data: bytes, w: int, height: int, four_bit: bool
) -> np.ndarray:
    """Decompress BI_RLE8/BI_RLE4 to a (height, w) index grid
    (bottom-up row order as stored; the caller flips). Escapes per
    the public spec: 0,0 = end of line; 0,1 = end of bitmap; 0,2 =
    delta (dx, dy skip — skipped pixels stay 0); 0,n>=3 = absolute
    run, padded to a word boundary. Encoded runs in RLE4 alternate
    the value byte's two nibbles."""
    out = np.zeros((height, w), dtype=np.uint8)
    x, y = 0, 0
    p = 0
    while p + 1 < len(data):
        cnt, val = data[p], data[p + 1]
        p += 2
        if cnt > 0:  # encoded run
            if y >= height:
                raise ValueError("RLE run outside bitmap")
            if four_bit:
                hi, lo = val >> 4, val & 0x0F
                for i in range(cnt):
                    if x < w:
                        out[y, x] = hi if i % 2 == 0 else lo
                    x += 1
            else:
                end = min(x + cnt, w)
                if x < w:
                    out[y, x:end] = val
                x += cnt
            continue
        # escapes
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if p + 1 >= len(data):
                raise ValueError("truncated RLE delta")
            x += data[p]
            y += data[p + 1]
            p += 2
        else:  # absolute mode: val pixels follow
            if y >= height:
                raise ValueError("RLE absolute run outside bitmap")
            if four_bit:
                nbytes = (val + 1) // 2
                if p + nbytes > len(data):
                    raise ValueError("truncated RLE absolute run")
                for i in range(val):
                    b = data[p + i // 2]
                    v = (b >> 4) if i % 2 == 0 else (b & 0x0F)
                    if x < w:
                        out[y, x] = v
                    x += 1
                p += nbytes + (nbytes & 1)  # word-aligned
            else:
                if p + val > len(data):
                    raise ValueError("truncated RLE absolute run")
                for i in range(val):
                    if x < w:
                        out[y, x] = data[p + i]
                    x += 1
                p += val + (val & 1)  # word-aligned
    raise ValueError("RLE stream missing end-of-bitmap marker")


def _decode_bmp_core(content: bytes, offset: int) -> np.ndarray:
    """OS/2 BITMAPCOREHEADER BMPs (12-byte header: uint16 w/h,
    always bottom-up, no compression; palette entries are 3-byte
    BGR, not 4-byte BGRX). Depths 1/4/8 (paletted) and 24-bit."""
    if offset < 14 + 12:
        raise ValueError(
            f"invalid BMP pixel offset {offset} (core headers end "
            "at 26)"
        )
    w, h, planes, bpp = struct.unpack_from("<HHHH", content, 18)
    if w == 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    if bpp not in (1, 4, 8, 24):
        raise ValueError(f"illegal core-BMP bit depth {bpp}")
    palette = None
    if bpp <= 8:
        n_colors = 1 << bpp
        tbl_at = 14 + 12
        if tbl_at + n_colors * 3 > min(offset, len(content)):
            raise ValueError(
                f"core-BMP color table ({n_colors} entries) overruns "
                "the pixel offset"
            )
        palette = (
            np.frombuffer(
                content, np.uint8, count=n_colors * 3, offset=tbl_at
            )
            .reshape(n_colors, 3)[:, [2, 1, 0]]  # BGR -> RGB
            .copy()
        )
    stride = (w * bpp + 31) // 32 * 4
    if offset + stride * h > len(content):
        raise ValueError(
            f"truncated BMP payload: need {offset + stride * h} "
            f"bytes, have {len(content)}"
        )
    buf = np.frombuffer(
        content, np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    if palette is not None:
        if bpp == 8:
            idx = buf[:, :w]
        else:
            bits = np.unpackbits(buf, axis=1)
            vals = bits.reshape(h, -1, bpp)
            weights = 1 << np.arange(bpp - 1, -1, -1)
            idx = (vals * weights).sum(axis=2)[:, :w]
        rgb = palette[idx]
    else:
        px = buf[:, : w * 3].reshape(h, w, 3)
        rgb = px[..., [2, 1, 0]]
    return np.ascontiguousarray(rgb[::-1])  # always bottom-up


def decode_bmp(content: bytes) -> np.ndarray:
    """Pure-numpy BMP decoder (public BITMAPFILEHEADER +
    BITMAPINFOHEADER spec) → (h, w, 3) uint8 RGB. Covers the full
    common spec as of the round-9 continuation: uncompressed BI_RGB
    at 24/32 bits (BGR(A) byte order, alpha dropped) and at
    1/4/8-bit paletted depths (MSB-first sub-byte packing, BGRX
    color table, biClrUsed honored, 0 = full table), plus BI_RLE8
    and BI_RLE4 compression (encoded/absolute/delta/EOL/EOB modes);
    bottom-up (positive height) or top-down (negative), rows padded
    to 4-byte strides. Needs no external codec, so the REAL decode
    path of :func:`decode_image` is exercisable in codec-free
    environments. Also 16-bit RGB555, BI_BITFIELDS (explicit
    16/32-bit channel masks, scaled to full range), OS/2
    BITMAPCOREHEADER files (:func:`_decode_bmp_core`), and the
    embedded BI_JPEG/BI_PNG compression modes (routed to the
    engine's OWN codecs) — the full practical BMP spec; only
    exotica like BI_ALPHABITFIELDS still gate."""
    if content[:2] != b"BM" or len(content) < 26:
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", content, 10)
    (header_size,) = struct.unpack_from("<I", content, 14)
    if header_size == 12:  # OS/2 BITMAPCOREHEADER
        return _decode_bmp_core(content, offset)
    if header_size < 40:
        raise ValueError(f"invalid BMP header size {header_size}")
    if len(content) < 54:
        raise ValueError("truncated BMP info header")
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
    (clr_used,) = struct.unpack_from("<I", content, 46)
    if compression == 4:  # BI_JPEG: the pixel array IS a JPEG stream
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(content[offset:])
    if compression == 5:  # BI_PNG
        return decode_png(content[offset:])
    valid = {
        (0, 1), (0, 4), (0, 8), (0, 16), (0, 24), (0, 32),
        (1, 8), (2, 4),  # BI_RLE8, BI_RLE4
        (3, 16), (3, 32),  # BI_BITFIELDS
    }
    if (compression, bpp) not in valid:
        raise NotImplementedError(
            f"unsupported BMP variant (bpp={bpp}, "
            f"compression={compression})"
        )
    masks = None
    if compression == 3:  # BI_BITFIELDS: explicit channel masks
        # masks are read at byte 54 regardless of header flavor
        # (header_size 40: three DWORDs follow the info header; V4/V5
        # headers >= 108 carry them at the same position), so 66
        # bytes are required whenever they are read — a corrupt
        # header_size in 41..107 must raise ValueError, not escape as
        # struct.error (ADVICE r9 #2)
        if 14 + 40 + 12 > len(content):
            raise ValueError("truncated BI_BITFIELDS masks")
        masks = struct.unpack_from("<III", content, 14 + 40)
        if any(m == 0 for m in masks):
            raise ValueError(f"zero BI_BITFIELDS channel mask {masks}")
    elif bpp == 16:  # plain 16-bit BI_RGB defaults to RGB555
        masks = (0x7C00, 0x03E0, 0x001F)
    top_down, height = h < 0, abs(h)
    if w <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    if top_down and compression in (1, 2):
        raise ValueError("top-down RLE BMPs are invalid per spec")
    palette = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        if n_colors > 256:
            raise ValueError(f"invalid BMP color count {n_colors}")
        tbl_at = 14 + header_size
        if tbl_at + n_colors * 4 > min(offset, len(content)):
            raise ValueError(
                f"BMP color table ({n_colors} entries at {tbl_at}) "
                "overruns the pixel offset"
            )
        palette = (
            np.frombuffer(
                content, np.uint8, count=n_colors * 4, offset=tbl_at
            )
            .reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX -> RGB
            .copy()
        )

    if compression in (1, 2):  # RLE: decompress straight to indices
        idx = _bmp_rle_indices(
            content[offset:], w, height, four_bit=(compression == 2)
        )
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError(
                f"BMP palette index {int(idx.max())} out of range "
                f"({palette.shape[0]} entries)"
            )
        return np.ascontiguousarray(palette[idx][::-1])

    stride = (w * bpp + 31) // 32 * 4
    if offset + stride * height > len(content):
        raise ValueError(
            f"truncated BMP payload: need {offset + stride * height}"
            f" bytes, have {len(content)}"
        )
    buf = np.frombuffer(
        content, np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)
    if palette is not None:
        if bpp == 8:
            idx = buf[:, :w]
        else:  # 1- or 4-bit: MSB-first sub-byte unpack
            bits = np.unpackbits(buf, axis=1)
            vals = bits.reshape(height, -1, bpp)
            weights = 1 << np.arange(bpp - 1, -1, -1)
            idx = (vals * weights).sum(axis=2)[:, :w]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError(
                f"BMP palette index {int(idx.max())} out of range "
                f"({palette.shape[0]} entries)"
            )
        rgb = palette[idx]
    elif masks is not None:
        # 16/32-bit masked pixels (RGB555 default or BI_BITFIELDS):
        # per-channel extract + scale to the full 8-bit range
        nb = bpp // 8
        words = (
            buf[:, : w * nb]
            .reshape(height, w, nb)
            .astype(np.uint32)
        )
        vals = np.zeros((height, w), dtype=np.uint32)
        for i in range(nb):
            vals |= words[..., i] << (8 * i)  # little-endian
        rgb = np.zeros((height, w, 3), dtype=np.uint8)
        for c, mask in enumerate(masks):
            shift = (mask & -mask).bit_length() - 1
            maxval = mask >> shift
            chan = (vals & mask) >> shift
            rgb[..., c] = (chan * 255 // maxval).astype(np.uint8)
    else:
        nb = bpp // 8
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_unfilter(
    raw: bytes, height: int, stride: int, bpp: int
) -> np.ndarray:
    """Invert the five PNG scanline filters over one (sub-)image:
    ``raw`` is ``height`` rows of ``1 + stride`` bytes (filter tag +
    packed scanline); returns the reconstructed ``(height, stride)``
    bytes. ``bpp`` is the spec's filter byte-offset (bytes per
    pixel, min 1)."""
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, np.int32
        )
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: per-lane cumsum (mod-256 homomorphic)
            if stride % bpp:
                # stride is only guaranteed lane-aligned for whole-
                # byte pixels; sub-byte rows use bpp=1 so this is
                # unreachable, but guard against a corrupt geometry
                raise ValueError(
                    f"PNG stride {stride} not divisible by bpp {bpp}"
                )
            rec = np.cumsum(
                cur.reshape(-1, bpp), axis=0, dtype=np.int64
            ).reshape(stride)
        elif f == 2:  # Up (mod-256 homomorphic)
            rec = cur + prev
        elif f == 3:  # Average: floor((left+up)/2) is NOT mod-
            # homomorphic — reconstruct left-to-right on true bytes
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth: branchy predictor, same dependency
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                )
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def _png_pixels(
    out: np.ndarray,
    w: int,
    h: int,
    ch: int,
    depth: int,
    color: int,
    plte,
) -> np.ndarray:
    """Unfiltered scanline bytes of one (sub-)image → ``(h, w, 3)``
    uint8 RGB: MSB-first sub-byte unpack (palette indices or
    scaled grayscale), 16-bit high-byte reduction, palette lookup,
    gray replication, alpha drop."""
    if depth < 8:
        bits = np.unpackbits(out, axis=1)
        vals = bits.reshape(h, -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (vals * weights).sum(axis=2)[:, :w]
        if color == 3:
            if int(vals.max(initial=0)) >= plte.shape[0]:
                raise ValueError(
                    f"palette index {int(vals.max())} out of range "
                    f"(PLTE has {plte.shape[0]} entries)"
                )
            return plte[vals]
        # sub-byte grayscale: scale 0..2^d-1 to the full 8-bit range
        # (255/(2^d-1) is integral for d in 1/2/4)
        gray = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if color == 3:
        idx = out[:, :w]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"(PLTE has {plte.shape[0]} entries)"
            )
        return plte[idx]
    if depth == 16:
        # big-endian 16-bit samples reduce to their HIGH byte (the
        # standard 16 -> 8 depth reduction; matches PIL's convert)
        out = np.ascontiguousarray(out.reshape(h, w * ch, 2)[..., 0])
    if color in (0, 4):
        gray = out.reshape(h, w, ch)[..., 0]
        return np.repeat(gray[:, :, None], 3, axis=2)
    return out.reshape(h, w, ch)[..., :3]  # alpha dropped


def decode_png(content: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder (W3C PNG spec / RFC 2083): chunk walk
    with CRC verification, concatenated-IDAT ``zlib`` inflate, and
    per-scanline unfiltering in numpy — the first COMPRESSED format
    to run the real decode path without an imaging library (BMP/WAV
    covered the uncompressed containers in round 8).

    Since the round-9 continuation this decoder covers EVERY legal
    static-image combination in the PNG spec → ``(h, w, 3)`` uint8
    RGB: color types 0/2/3/4/6 at all their legal bit depths
    (grayscale 1/2/4/8/16 — sub-byte scaled to full range, 16-bit
    reduced to the high byte; truecolor±alpha 8/16, alpha dropped;
    palette 1/2/4/8, MSB-first sub-byte packing, PLTE lookup;
    ``tRNS`` transparency dropped like alpha), both interlace
    methods (none and Adam7 — seven per-pass filtered sub-images
    scattered back onto the pixel grid). All FIVE scanline filters
    invert (:func:`_png_unfilter`): None and Up are mod-256-
    homomorphic vector adds; Sub is a per-byte-lane cumulative sum;
    Average and Paeth carry a true left-neighbor dependency, so they
    reconstruct pixel-by-pixel against the already-reconstructed
    previous row (stride-step loop — scanlines are short; the heavy
    lifting, inflate + the two vector filters, stays in C/numpy).
    There is no ``NotImplementedError`` path left: anything this
    decoder rejects — bad magic, CRC mismatch, truncated chunks,
    inflate size mismatch, illegal color/depth combination,
    out-of-range palette index — is a corrupt payload and raises
    ``ValueError`` (the :func:`decode_bmp` / :func:`decode_wav`
    contract).
    """
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 12 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        if pos + 12 + length > len(content):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if ihdr is not None:
                # one header per image (spec); a second would
                # silently redefine the geometry of already-listed
                # IDAT bytes (the WAV duplicate-data lesson)
                raise ValueError("duplicate PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 256 * 3:
                raise ValueError(f"malformed PLTE chunk ({length} bytes)")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, tRNS, ...) are CRC-checked
        # and skipped
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(
            f"invalid PNG compression/filter method ({comp}/{filt})"
        )
    legal_depths = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }
    if color not in legal_depths or depth not in legal_depths[color]:
        raise ValueError(
            f"illegal PNG color-type/bit-depth combination "
            f"(color={color}, depth={depth})"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    # filtering operates on BYTES: bpp = filter offset, stride =
    # bytes per scanline (sub-byte rows pack MSB-first)
    bpp = max(1, ch * depth // 8)

    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:  # Adam7 (spec 4.5.2): (x0, y0, dx, dy) per pass
        passes = []
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                passes.append((x0, y0, dx, dy, pw, ph))

    def pass_stride(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    need = sum(ph * (pass_stride(pw) + 1)
               for _, _, _, _, pw, ph in passes)
    # bounded inflate: cap the output at the header-declared size so
    # a payload whose zlib stream disagrees with its IHDR (an inflate
    # bomb behind a small declared geometry) can never allocate past
    # need+1 bytes — the plain-decompress form would materialize the
    # whole stream before the length check
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(b"".join(idat), need + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel data: {exc}") from exc
    if len(raw) != need or not dec.eof:
        raise ValueError(
            f"PNG pixel data length mismatch: expected {need} bytes, "
            f"inflated {'>' if len(raw) > need or not dec.eof else ''}"
            f"{len(raw)}"
        )

    result = np.zeros((h, w, 3), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        stride = pass_stride(pw)
        out = _png_unfilter(raw[off : off + ph * (stride + 1)],
                            ph, stride, bpp)
        off += ph * (stride + 1)
        result[y0::dy, x0::dx] = _png_pixels(
            out, pw, ph, ch, depth, color, plte
        )
    return result


def encode_png(arr: np.ndarray, filter_strategy: str = "none") -> bytes:
    """Pure-stdlib PNG writer (8-bit RGB, non-interlaced), the sink
    twin of :func:`decode_png`. ``filter_strategy``: ``'none'`` emits
    every scanline with filter 0 (fastest, what a production raw-dump
    sink would pick); ``'cycle'`` filters row ``y`` with type
    ``y % 5`` — deliberately exercising all five unfilter paths of
    the decoder in one payload, which is what the distributed
    round-trip query (q249) and the fuzz units encode with. Filters
    are computed vectorized on the RAW bytes of the current/previous
    rows (the spec's definition), subtraction mod 256."""
    if filter_strategy not in ("none", "cycle"):
        raise ValueError(
            f"unknown filter_strategy {filter_strategy!r}:"
            " use 'none' or 'cycle'"
        )
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8 array, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        # a zero-dim payload would round-trip to decode_png's
        # invalid-dimensions ValueError anyway; fail at the source
        raise ValueError(f"cannot encode empty image {h}x{w}")
    ch = 3
    flat = arr.reshape(h, w * ch).astype(np.int16)
    # raw-byte neighbor planes, vectorized: left (shift by bpp), up
    # (previous row), upleft (both)
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, ch:] = flat[:-1, :-ch]
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )
    filtered = {
        0: flat,
        1: (flat - left) & 0xFF,
        2: (flat - up) & 0xFF,
        3: (flat - ((left + up) >> 1)) & 0xFF,
        4: (flat - paeth) & 0xFF,
    }
    lines = bytearray()
    for y in range(h):
        f = (y % 5) if filter_strategy == "cycle" else 0
        lines.append(f)
        lines += filtered[f][y].astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Pure-struct RIFF/WAVE parser: walks the chunk list (chunks
    pad to even offsets) and returns ``((n_frames, channels) int16,
    sample_rate)``. Formats (round 10 completed the practical set):
    integer PCM at 8 (unsigned, rescaled), 16 (native), 24 and 32
    bits (high-16 taken — the int16 return contract is lossy for
    wider words, documented); IEEE float 32/64 (format 3, [-1, 1]
    scaled to int16 with clipping); G.711 µ-law (7) and A-law (6)
    via the public G.711 segment-expansion formulas; mono IMA ADPCM
    (0x11) routed to :func:`decode_adpcm_wav` — the compressed-audio
    path, round 9; and WAVE_FORMAT_EXTENSIBLE (0xFFFE), unwrapped to
    the SubFormat tag carried in the fmt extension. MP3-in-WAV and
    other codec formats raise ``NotImplementedError`` (they need
    libsndfile/ffmpeg-class dependencies).

    Deliberately NOT the stdlib ``wave`` module: this parser keeps
    the operator contract's exception types (``ValueError`` /
    ``NotImplementedError``, never ``wave.Error``) so mapInPandas
    failures stay diagnosable, and its lenient behaviors are pinned
    by tests as part of the contract — a declared data size larger
    than the payload truncates to whole frames (matching the raw-PCM
    path's convention), unknown chunks are skipped with even padding,
    and a duplicate ``data`` chunk is ignored (FIRST wins — RIFF
    defines one data chunk per WAVE form, so the first is the
    canonical one and anything after it is trailing junk; ADVICE r8
    flagged the previous silent last-wins)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, fmt_body, data = 12, None, b"", None
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
            fmt_body = body  # kept raw for EXTENSIBLE SubFormat
        elif cid == b"data" and data is None:
            data = body  # first data chunk wins (see docstring)
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt[:6]
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real tag is the first two
        # bytes of the SubFormat GUID in the fmt extension
        # (offset 16: cbSize(2) + validBits(2) + channelMask(4) +
        # GUID — the tag is the GUID's leading uint16)
        body = fmt_body
        if len(body) < 26:
            raise ValueError(
                "WAVE_FORMAT_EXTENSIBLE fmt chunk too short"
            )
        audio_format = struct.unpack_from("<H", body, 24)[0]
    if audio_format == 0x11:
        # compressed path (round 9): mono 4-bit IMA ADPCM decodes
        # natively — re-walk via the block-structured decoder
        return decode_adpcm_wav(content)
    if channels < 1:
        raise ValueError("malformed WAV: zero channels")

    def frames(raw: np.ndarray) -> np.ndarray:
        n = len(raw) // channels * channels
        return raw[:n].reshape(-1, channels)

    if audio_format == 1:  # integer PCM
        if bits == 16:
            pcm = np.frombuffer(
                data[: len(data) // 2 * 2], dtype="<i2"
            )
            return frames(pcm), sample_rate
        if bits == 8:  # unsigned by spec; rescale to int16
            u8 = np.frombuffer(data, dtype=np.uint8)
            return (
                frames(
                    ((u8.astype(np.int16) - 128) << 8).astype(
                        np.int16
                    )
                ),
                sample_rate,
            )
        if bits == 24:  # 3-byte little-endian; high 16 kept
            n = len(data) // 3 * 3
            b = np.frombuffer(data[:n], dtype=np.uint8).reshape(-1, 3)
            hi16 = (
                b[:, 1].astype(np.uint16)
                | (b[:, 2].astype(np.uint16) << 8)
            ).astype(np.int16)
            return frames(hi16), sample_rate
        if bits == 32:  # high 16 kept
            i32 = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<i4"
            )
            return frames((i32 >> 16).astype(np.int16)), sample_rate
        raise NotImplementedError(
            f"{bits}-bit integer PCM WAV not supported"
        )
    if audio_format == 3:  # IEEE float, [-1, 1]
        if bits == 32:
            f = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<f4"
            ).astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(
                data[: len(data) // 8 * 8], dtype="<f8"
            )
        else:
            raise ValueError(f"bad float WAV bit width {bits}")
        pcm = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(
            np.int16
        )
        return frames(pcm), sample_rate
    if audio_format in (6, 7):  # G.711 A-law / mu-law
        table = (
            _ALAW_TABLE if audio_format == 6 else _MULAW_TABLE
        )
        return frames(table[np.frombuffer(data, dtype=np.uint8)]), (
            sample_rate
        )
    raise NotImplementedError(
        f"WAV codec format {audio_format} ({bits}-bit) not "
        "supported natively — needs libsndfile/ffmpeg-class "
        "dependencies (MP3-in-WAV and friends)"
    )


def _g711_mulaw_expand(u: int) -> int:
    """G.711 mu-law byte → linear (the public Sun g711.c formula:
    complement, rebias mantissa, shift by segment, sign)."""
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _g711_alaw_expand(a: int) -> int:
    """G.711 A-law byte → linear (toggle the even bits with 0x55,
    expand the 4-bit mantissa within its segment; bit 7 set means
    POSITIVE in A-law)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (a & 0x80) else -t


_MULAW_TABLE = np.array(
    [_g711_mulaw_expand(i) for i in range(256)], dtype=np.int16
)
_ALAW_TABLE = np.array(
    [_g711_alaw_expand(i) for i in range(256)], dtype=np.int16
)


#: IMA ADPCM tables (public IMA spec / RFC 3551 DVI4 lineage)
_ADPCM_INDEX_TABLE = (
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8,
)
_ADPCM_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)


def _adpcm_decode_nibbles(
    nibbles, pred: int, index: int
) -> list:
    """The IMA ADPCM decoder state machine (integer-exact, public
    spec): one 4-bit code -> one int16 sample. ``pred``/``index``
    come from the block header; returns the decoded samples."""
    out = []
    for nib in nibbles:
        step = _ADPCM_STEP_TABLE[index]
        mag = nib & 7
        diff = step >> 3
        if mag & 4:
            diff += step
        if mag & 2:
            diff += step >> 1
        if mag & 1:
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _ADPCM_INDEX_TABLE[nib]))
        out.append(pred)
    return out


def _adpcm_encode_sample(sample: int, pred: int, index: int):
    """One step of the standard IMA quantizer: returns
    ``(nibble, new_pred, new_index)`` — new_pred is the DECODER's
    reconstruction, so encoder and decoder state never drift."""
    step = _ADPCM_STEP_TABLE[index]
    diff = sample - pred
    nib = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    delta = 0
    if diff >= step:
        delta |= 4
        diff -= step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        delta |= 1
    nib |= delta
    dec = _adpcm_decode_nibbles([nib], pred, index)[0]
    index = max(0, min(88, index + _ADPCM_INDEX_TABLE[nib]))
    return nib, dec, index


def encode_adpcm_wav(
    pcm: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode mono int16 PCM to an IMA-ADPCM WAV (format tag 0x11):
    per block a 4-byte header (predictor int16 = the block's first
    sample verbatim, step index, reserved) followed by 4-bit codes
    two-per-byte (low nibble first) — ~4:1 compression. The ``fact``
    chunk records the true sample count so trailing pad codes in the
    final block are cropped on decode. ``samples_per_block`` must be
    odd (1 header sample + an even nibble count)."""
    pcm = np.asarray(pcm, dtype=np.int64).ravel()
    if pcm.size == 0:
        raise ValueError("cannot encode zero samples")
    if samples_per_block < 3 or samples_per_block % 2 == 0:
        raise ValueError(
            f"samples_per_block must be odd and >= 3, got "
            f"{samples_per_block}"
        )
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    for start in range(0, pcm.size, samples_per_block):
        chunk = pcm[start : start + samples_per_block]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in chunk[1:]:
            nib, pred, index = _adpcm_encode_sample(int(s), pred, index)
            nibs.append(nib)
        nibs += [0] * (samples_per_block - 1 - len(nibs))  # pad codes
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            blocks.append(lo | (hi << 4))
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        sample_rate * block_align // samples_per_block,
        block_align, 4,
        2,  # cbSize
        samples_per_block,
    )
    data = bytes(blocks)
    return (
        struct.pack(
            "<4sI4s",
            b"RIFF",
            4 + (8 + len(fmt)) + (8 + 4) + (8 + len(data)),
            b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sII", b"fact", 4, pcm.size)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def codes_to_adpcm_wav(codes, sample_rate: int) -> bytes:
    """Build a SINGLE-BLOCK IMA-ADPCM WAV directly from raw 4-bit
    codes (predictor 0, step index 0): the decoder-driven synthesis
    q256 uses — the decoded waveform is then a pure fold of the
    public state machine over the code stream, which a DuckDB
    recursive CTE can replay bit-for-bit. Pads the nibble area to an
    even count; the ``fact`` chunk crops the pad on decode."""
    codes = list(codes)
    if any(not 0 <= c <= 15 for c in codes):
        raise ValueError("ADPCM codes must be 4-bit (0..15)")
    n_samples = len(codes) + 1  # header predictor is sample 0
    if len(codes) % 2:
        codes.append(0)  # pad nibble (cropped via fact)
    block = struct.pack("<hBB", 0, 0, 0) + bytes(
        lo | (hi << 4) for lo, hi in zip(codes[0::2], codes[1::2])
    )
    block_align = len(block)
    samples_per_block = 1 + 2 * (block_align - 4)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        max(1, sample_rate * block_align // samples_per_block),
        block_align, 4, 2, samples_per_block,
    )
    return (
        struct.pack(
            "<4sI4s",
            b"RIFF",
            4 + (8 + len(fmt)) + (8 + 4) + (8 + len(block)),
            b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sII", b"fact", 4, n_samples)
        + struct.pack("<4sI", b"data", len(block))
        + block
    )


def decode_adpcm_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono IMA-ADPCM WAV (format tag 0x11) produced by
    :func:`encode_adpcm_wav` or any spec-conforming writer: walks the
    RIFF chunks with :func:`decode_wav`'s conventions, then runs the
    block-structured state machine; the ``fact`` chunk (when present)
    crops trailing pad codes. Returns ``((n, 1) int16, rate)``."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"malformed WAV fmt chunk ({len(body)} bytes)"
                )
            fmt = body
        elif cid == b"fact" and len(body) >= 4:
            fact = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data" and data is None:
            data = body  # first data chunk wins (decode_wav contract)
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE wrapper: unwrap to the SubFormat
        # GUID's leading uint16, same as decode_wav — otherwise an
        # EXTENSIBLE-wrapped 0x11 stream routed here by decode_wav's
        # unwrapped dispatch re-reads the raw tag and raises a
        # misleading "got format 0xFFFE" (ADVICE r10 #3)
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if tag != 0x11:
        raise NotImplementedError(
            f"decode_adpcm_wav handles IMA ADPCM (0x11) only, got "
            f"format {tag}"
        )
    if channels != 1 or bits != 4:
        raise NotImplementedError(
            f"mono 4-bit IMA ADPCM only (channels={channels}, "
            f"bits={bits})"
        )
    if block_align < 5:
        raise ValueError(f"ADPCM block_align too small: {block_align}")
    samples = []
    for start in range(0, len(data) // block_align * block_align,
                       block_align):
        block = data[start : start + block_align]
        pred, index, _ = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            raise ValueError(f"ADPCM step index {index} out of range")
        samples.append(pred)
        nibbles = []
        for b in block[4:]:
            nibbles.append(b & 0x0F)
            nibbles.append(b >> 4)
        samples.extend(_adpcm_decode_nibbles(nibbles, pred, index))
    if fact is not None:
        samples = samples[:fact]
    return (
        np.asarray(samples, dtype=np.int16).reshape(-1, 1),
        rate,
    )


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


def encode_avi_mjpeg(
    frames: list, fps: int = 10, quality: int = 50
) -> bytes:
    """Minimal Motion-JPEG AVI writer (the Microsoft RIFF-AVI public
    layout): ``RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf))
    LIST(movi 00dc...) idx1)`` with one ``vids/MJPG`` stream — each
    frame a baseline JPEG from :func:`jpeg_codec.encode_jpeg`. All
    frames must share one (h, w[, 3]) shape; ``fps`` lands in both
    ``avih.dwMicroSecPerFrame`` and ``strh.dwRate/dwScale``."""
    from .jpeg_codec import encode_jpeg

    if not frames:
        raise ValueError("cannot encode an AVI with zero frames")
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    shape = np.asarray(frames[0]).shape
    payloads = []
    for f in frames:
        arr = np.asarray(f)
        if arr.shape != shape:
            raise ValueError(
                f"frame shape {arr.shape} != first frame {shape}"
            )
        payloads.append(encode_jpeg(arr, quality))
    h, w = shape[0], shape[1]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0,
        0x10,  # AVIF_HASINDEX
        len(payloads), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIIIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0,
        1, fps,  # dwScale, dwRate: fps = rate/scale
        0, len(payloads), 0, 0xFFFFFFFF, 0,
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
        h * ((w * 3 + 3) & ~3), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for p in payloads:
        offsets.append((len(movi_body), len(p)))
        movi_body += chunk(b"00dc", p)
    movi = chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, ln)
        for off, ln in offsets
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(content: bytes) -> tuple[list, float]:
    """Walk a RIFF-AVI container and decode every video chunk
    (``##dc``/``##db``) as baseline JPEG; returns ``(frames, fps)``
    with each frame an (h, w, 3) uint8 array. The chunk walk uses the
    WAV parser's conventions (even padding, unknown chunks skipped,
    ``ValueError`` for corrupt structure). Non-MJPG video streams
    raise ``NotImplementedError`` (they need ffmpeg); so do
    unsupported JPEG variants inside frames, via
    :func:`jpeg_codec.decode_jpeg`."""
    from .jpeg_codec import decode_jpeg

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    fps = 0.0
    frames: list = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(
                    f"AVI chunk {cid!r} overruns its parent "
                    f"({body_end} > {end})"
                )
            if cid == b"LIST":
                walk(data, body_start + 4, body_end)
            elif cid == b"avih":
                if size < 56:
                    raise ValueError("truncated avih header")
                usec = struct.unpack_from("<I", data, body_start)[0]
                if fps == 0.0 and usec:
                    fps = 1_000_000 / usec
            elif cid == b"strh":
                if size < 56:
                    raise ValueError("truncated strh header")
                fcc_type = data[body_start : body_start + 4]
                handler = data[body_start + 4 : body_start + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r} not "
                            "supported — MJPG only (others need "
                            "ffmpeg)"
                        )
                    scale, rate = struct.unpack_from(
                        "<II", data, body_start + 20
                    )
                    if scale:
                        fps = rate / scale  # stream header wins
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(
                    decode_jpeg(data[body_start:body_end])
                )
            pos = body_end + (size & 1)  # chunks pad to even

    walk(content, 12, min(len(content), 8 + struct.unpack_from(
        "<I", content, 4)[0]))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, fps


VIDEO_FRAME_SUM_SCHEMA = (
    "media_id long, frame_idx int, height int, width int,"
    " sum_r long, sum_g long, sum_b long"
)


def container_frame_sums(df: DataFrame) -> DataFrame:
    """Per-frame integer channel sums over ANIMATED-container
    payloads — the video member of the oracle-friendly checksum
    family (q53 images / q102 audio / q254 JPEG stills). The
    container is sniffed per payload: MJPEG-AVI (RIFF walk +
    per-frame JPEG decode) or animated GIF (LZW + 89a compositing);
    either way the walk and decode run INSIDE the task via
    ``mapInPandas`` and only ~50 bytes of features per frame ever
    shuffle."""

    return df.select("media_id", "content").mapInPandas(
        frame_sums_batches, VIDEO_FRAME_SUM_SCHEMA
    )


def frame_sums_batches(batches: Iterator) -> Iterator:
    """Batch-generator body of :func:`container_frame_sums`, exposed
    module-level so a payload-SYNTHESIS generator can be composed in
    front of it inside ONE ``mapInPandas`` stage (guide §4: the codec
    queries previously ran synth and decode as two chained Python
    stages, shipping every payload Python→JVM→Python for no reason —
    fusing halves the boundary crossings and drops a plan node while
    executing the identical decode code path)."""
    import pandas as pd

    from .gif_codec import decode_gif

    cols = [
        "media_id", "frame_idx", "height", "width",
        "sum_r", "sum_g", "sum_b",
    ]
    for pdf in batches:
        rows = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            raw = bytes(content) if content is not None else b""
            if raw[:4] == b"GIF8":
                frames, _ = decode_gif(raw)
            else:
                frames, _ = decode_avi_mjpeg(raw)
            for i, arr in enumerate(frames):
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "frame_idx": i,
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "sum_r": int(sums[0]),
                        "sum_g": int(sums[1]),
                        "sum_b": int(sums[2]),
                    }
                )
        yield pd.DataFrame(rows, columns=cols)


#: historical name from the AVI-only round-9 first pass; the sniffing
#: generalization kept the callable identity for q255 and the tests
mjpeg_frame_sums = container_frame_sums


def decode_image(
    content: bytes, use_real_codec: bool = False
) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 array.

    Real path: BMP payloads (``BM`` magic) decode natively via
    :func:`decode_bmp` and PNG payloads (``\\x89PNG`` signature) via
    :func:`decode_png` — no external codec; anything else needs PIL
    (absent here → ``NotImplementedError``). When a native decode
    FAILS (unsupported variant or corrupt payload) and PIL is also
    absent, the raised ``NotImplementedError`` chains ``from`` the
    native failure and quotes it, so a mapInPandas stack trace
    distinguishes bad data from a missing codec (ADVICE r8). The
    fake path is a deterministic pseudo-image seeded by the content
    hash — stable across runs/executors, so tests can assert exact
    features.

    The fake pixel stream is an md5 hash chain, NOT a PRNG: byte
    block ``i`` is ``md5(f"{md5(content).hexdigest()}-{i}")``.  The
    same chain is expressible in ANSI SQL (md5 + substr + hex cast),
    which is what lets the q53 driver query carry a full DuckDB
    oracle instead of a rows-only check.
    """
    if use_real_codec:
        native_err: Exception | None = None
        if content[:2] == b"BM":
            try:
                return decode_bmp(content)
            except (NotImplementedError, ValueError) as exc:
                # paletted/RLE/core-header variants AND malformed-
                # but-BM-magic payloads (truncated padding, corrupt
                # offsets, non-BMP bytes starting 'BM') fall through
                # to PIL, which decodes or rejects them where it
                # exists; PIL-absent, the captured failure chains
                # through the gate below (ADVICE r8: don't misreport
                # corrupt data as a missing codec)
                native_err = exc
        elif content[:8] == _PNG_SIG:
            try:
                return decode_png(content)
            except (NotImplementedError, ValueError) as exc:
                # palette/16-bit/interlaced variants and corrupt
                # payloads — same fall-through contract as BMP
                native_err = exc
        elif content[:3] == b"\xff\xd8\xff":
            try:
                from .jpeg_codec import decode_jpeg

                return decode_jpeg(content)
            except (NotImplementedError, ValueError) as exc:
                # arithmetic/12-bit/lossless variants and corrupt
                # payloads — same fall-through contract as BMP/PNG
                native_err = exc
        elif content[:4] == b"GIF8":
            try:
                from .gif_codec import decode_gif_first_frame

                return decode_gif_first_frame(content)
            except (NotImplementedError, ValueError) as exc:
                # corrupt payloads (all four disposal methods decode
                # natively) — same fall-through contract as the other
                # containers
                native_err = exc
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            if native_err is not None:
                raise NotImplementedError(
                    f"native decode failed ({native_err!r}) and PIL "
                    "is not available to retry the payload — a "
                    "chained ValueError means corrupt data, a chained "
                    "NotImplementedError an unsupported format "
                    "variant, not a missing codec"
                ) from native_err
            raise NotImplementedError(
                "real decoding of this payload requires PIL, which "
                "is not available in this environment; uncompressed "
                "24/32-bit BMP (decode_bmp), 8-bit RGB/RGBA PNG "
                "(decode_png) and baseline JPEG (jpeg_codec."
                "decode_jpeg) decode natively, or use the "
                "deterministic fake decoder (use_real_codec=False)"
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
        return channel_sums_batches(batches, use_real_codec)

    return df.select("media_id", "content").mapInPandas(
        run, IMAGE_CHECKSUM_SCHEMA
    )


def channel_sums_batches(
    batches: Iterator, use_real_codec: bool = False
) -> Iterator:
    """Batch-generator body of :func:`image_channel_sums`, exposed
    module-level for single-stage composition with a payload-synthesis
    generator (see :func:`frame_sums_batches` for the why)."""
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


DECODED_FRAME_SCHEMA = (
    "media_id long, frame_idx int, height int, width int, content binary"
)


def decode_frames(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Animated-container frame extraction. The REAL path (round 9)
    sniffs the container: Motion-JPEG AVI (:func:`decode_avi_mjpeg`
    — RIFF walk + the pure-numpy baseline JPEG decoder) and animated
    GIF (``gif_codec.decode_gif`` — LZW + 89a compositing) both
    decode natively, one row per frame with the raw RGB buffer as
    the payload; other codecs still require ffmpeg bindings, absent
    in this environment, and the default gate preserves the
    original contract."""
    if not use_real_codec:
        raise NotImplementedError(
            "general video frame decoding requires ffmpeg, not "
            "available here; MJPEG-AVI and animated-GIF payloads "
            "decode natively via decode_frames(df, "
            "use_real_codec=True), and sample_frame_plan() produces "
            "the distributed work plan an ffmpeg stage would consume"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .gif_codec import decode_gif

        cols = ["media_id", "frame_idx", "height", "width", "content"]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                if raw[:4] == b"GIF8":
                    frames, _ = decode_gif(raw)
                else:
                    frames, _ = decode_avi_mjpeg(raw)
                for i, arr in enumerate(frames):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "height": arr.shape[0],
                            "width": arr.shape[1],
                            "content": arr.tobytes(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "content").mapInPandas(
        run, DECODED_FRAME_SCHEMA
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
        return audio_stats_batches(batches, container)

    return df.select("media_id", "content").mapInPandas(
        run, AUDIO_INT_SCHEMA
    )


def audio_stats_batches(
    batches: Iterator, container: str = "pcm"
) -> Iterator:
    """Batch-generator body of :func:`audio_int_stats`, exposed
    module-level for single-stage composition with a payload-synthesis
    generator (see :func:`frame_sums_batches` for the why)."""
    import pandas as pd

    if container not in ("pcm", "wav"):
        # same guard as audio_int_stats (r8 review): a direct caller
        # passing 'WAV'/'riff' would otherwise silently fall into the
        # pcm branch and parse the 44-byte RIFF header as samples
        raise ValueError(
            f"unknown audio container {container!r}: use 'pcm' or 'wav'"
        )

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
