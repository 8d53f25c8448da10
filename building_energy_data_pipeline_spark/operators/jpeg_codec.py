"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

The second COMPRESSED container to decode natively (after round 9's
PNG): no PIL, no libjpeg — stdlib ``struct`` for the marker walk,
numpy for the DCT math, and the spec's own Annex K tables for
quantization and Huffman coding. ``operators/multimodal.decode_image``
sniffs the ``FF D8 FF`` SOI signature and routes here before falling
back to PIL, exactly like the BMP/PNG gates.

Scope (documented, spec-cited):

- **decode**: baseline sequential DCT (SOF0/1) AND progressive
  (SOF2 — spectral selection + successive approximation, EOB-run
  coding, per-scan mutable Huffman tables; Annex G), 8-bit
  precision, Huffman entropy coding, 1 or 3 components,
  per-component sampling factors 1 or 2 (covers 4:4:4 / 4:2:2 /
  4:2:0), single-component scans as non-interleaved (A.2.2),
  restart markers (DRI/RSTn) in both modes, 8- and 16-bit DQT
  precision, multi-table DHT segments, 0xFF00 byte unstuffing.
  Arithmetic coding (SOF9+), 12-bit precision, lossless and
  hierarchical modes raise ``NotImplementedError`` — unsupported
  VARIANTS, distinct from corrupt payloads which raise
  ``ValueError`` (the multimodal error contract, ADVICE r8).
- **encode**: baseline SOF0 (grayscale, 4:4:4 or 4:2:0 YCbCr,
  optional restart markers) plus a PROGRESSIVE encoder
  (:func:`encode_jpeg_progressive`, spectral selection with
  EOB-run coding and a custom EOBn-capable Huffman table) — the
  self-test twin whose streams must decode pixel-identically to
  the baseline layout; Annex K quantization tables scaled by the
  public IJG quality formula, edge-replication padding to 8×8
  blocks. Successive-approximation DECODE paths are pinned by
  hand-built spec-derived streams in the tests (an SA encoder
  would only test itself).

Exactness property the q254 oracle leans on: a block-FLAT grayscale
image with even pixel values round-trips bit-exactly at quality 50 —
the DCT of a constant block is DC-only (``F(0,0) = 8·(v-128)``,
orthonormal 2-D DCT-II ≡ the spec's FDCT), the Annex K luminance
table quantizes DC by 16, and ``8·(v-128)/16 = (v-128)/2`` is an
integer for even ``v``; every AC coefficient is an analytic zero that
quantization rounds away, and the decoder's float64 IDCT + ``rint``
reconstructs ``v`` with ~1e-13 headroom. So DuckDB can recompute the
decoded pixels CLOSED-FORM and the driver hash checks the entire
marker-walk → Huffman → dequant → IDCT path with zero tolerance
(the q249 PNG pattern, extended to a lossy codec by staying on its
lossless subspace).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — public)
# --------------------------------------------------------------------------

#: K.1 luminance quantization table, natural (row-major) order
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: K.2 chrominance quantization table
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            # odd diagonals run top-right -> bottom-left (row
            # ascending), even ones the reverse (spec figure A.6)
            rc[0] if (rc[0] + rc[1]) % 2 else -rc[0],
        ),
    )
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
#: inverse permutation: natural index -> zigzag position
ZIGZAG_FLAT = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]

# Annex K.3 Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix; ``D @ B @ D.T`` is the spec's FDCT
    (A.3.3) and ``D.T @ F @ D`` its IDCT."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    d = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * n + 1) * k / 16.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d


_DCT = _dct_matrix()


def scale_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """The public IJG quality scaling: 1..100 → table, 50 = Annex K
    verbatim (the property the q254 exact oracle relies on)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Huffman tables
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (spec Annex C): symbol ->
    (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Length-bucketed canonical decode: per length, [min_code,
    max_code] + first value index — O(length) per symbol, no dict of
    every prefix."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.max_code[length] >= code >= self.min_code[length]:
                return self.vals[
                    self.val_ptr[length] + code - self.min_code[length]
                ]
        raise ValueError("invalid Huffman code in entropy stream")


# --------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker. ``sync_restart`` consumes an expected RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated at 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # real marker mid-stream (EOI before expected
                    # data): surface as corruption
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside "
                        "entropy-coded segment"
                    )
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker (F.2.1.3.1)."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise ValueError(
                f"expected restart marker RST{expected} at byte "
                f"{self.pos}"
            )
        self.pos += 2


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.bitbuf & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.bitbuf = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec F.1.2.3)
        return bytes(self.out)


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _category(v: int) -> int:
    """Bit length of |v| (spec F.1.2.1.2, table F.1)."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _pad_edge_to_blocks(plane: np.ndarray, block_h: int, block_w: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % block_h
    pw = (-w) % block_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _emit_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """FDCT + quantize + entropy-encode ONE level-shifted 8×8 block;
    returns the updated DC predictor."""
    coefs = _DCT @ block @ _DCT.T
    quant = np.rint(coefs / qtable).astype(np.int64)
    zz = quant.flatten()[ZIGZAG_FLAT]
    # DC: DPCM + category + magnitude bits
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(mag & ((1 << size) - 1), size)
    # AC: run-length of zeros + (run,size) symbols
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        mag = v if v >= 0 else v + (1 << size) - 1
        writer.write(mag & ((1 << size) - 1), size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return pred


def _dqt_segment(tid: int, qtable: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(
        int(v) for v in qtable.flatten()[ZIGZAG_FLAT]
    )
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform, rounded to uint8 planes."""
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(
        np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[..., 0].astype(np.float64)
    cb = planes[..., 1].astype(np.float64) - 128.0
    cr = planes[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _box_downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 box average (the 4:2:0 chroma path); odd dims are edge-
    padded to even first so every output sample averages real data."""
    p = _pad_edge_to_blocks(plane.astype(np.float64), 2, 2)
    h, w = p.shape
    return np.rint(
        p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    ).astype(np.uint8)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 50,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 to a
    baseline JFIF JPEG — SOF0, Annex K tables scaled by ``quality``,
    edge-replication block padding, interleaved single scan.

    ``subsampling``: ``"444"`` (1×1 chroma) or ``"420"`` (2×2 luma
    sampling factor, 2×2-box-averaged chroma) — ignored for
    grayscale. ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that-many MCUs (predictors reset, writer
    byte-aligned) — the decoder's restart path is testable against
    real streams because of this knob.
    """
    if arr.ndim == 2:
        gray = True
    elif arr.ndim == 3 and arr.shape[2] == 3:
        gray = False
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) array, got {arr.shape}")
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got "
                         f"{subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"image dimensions out of JPEG range: {h}x{w}")

    ql = scale_quant_table(QUANT_LUMA, quality)
    qc = scale_quant_table(QUANT_CHROMA, quality)
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # components: (plane, hs, vs, qtable, dc codes, ac codes)
    if gray:
        comps = [(arr, 1, 1, ql, dc_l, ac_l)]
    else:
        ycc = rgb_to_ycbcr(arr)
        if subsampling == "444":
            comps = [
                (ycc[..., 0], 1, 1, ql, dc_l, ac_l),
                (ycc[..., 1], 1, 1, qc, dc_c, ac_c),
                (ycc[..., 2], 1, 1, qc, dc_c, ac_c),
            ]
        else:  # 420
            comps = [
                (ycc[..., 0], 2, 2, ql, dc_l, ac_l),
                (_box_downsample2(ycc[..., 1]), 1, 1, qc, dc_c, ac_c),
                (_box_downsample2(ycc[..., 2]), 1, 1, qc, dc_c, ac_c),
            ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (  # APP0 JFIF 1.01, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)

    sof = bytearray()
    sof += struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, hs, vs, _, _, _) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + bytes(sof)

    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytearray([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + bytes(sos)

    # pad every plane to its full MCU coverage (edge replication —
    # keeps padded blocks flat for block-flat inputs, the q254
    # exactness hinge) and level-shift once
    shifted = []
    for plane, hs, vs, qt, dct, act in comps:
        full_h, full_w = mcus_y * vs * 8, mcus_x * hs * 8
        ph, pw = plane.shape
        padded = np.pad(
            plane,
            ((0, full_h - ph), (0, full_w - pw)),
            mode="edge",
        )
        shifted.append(padded.astype(np.float64) - 128.0)

    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_count = 0
    rst_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                out += writer.flush()
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst_index])
                rst_index = (rst_index + 1) % 8
                preds = [0] * len(comps)
            for ci, (_, hs, vs, qt, dct, act) in enumerate(comps):
                for v in range(vs):
                    for u in range(hs):
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        block = shifted[ci][
                            y0 : y0 + 8, x0 : x0 + 8
                        ]
                        preds[ci] = _emit_block(
                            writer, block, qt, dct, act, preds[ci]
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to an
    ``(h, w, 3)`` uint8 RGB array (grayscale replicated across
    channels — the ``decode_image`` return contract shared with
    BMP/PNG). Progressive streams accumulate coefficients across
    scans in :class:`_ProgressiveState` and reconstruct at EOI.

    Raises ``ValueError`` for corrupt payloads and
    ``NotImplementedError`` for spec features outside the supported
    subset (arithmetic coding, 12-bit precision, lossless and
    hierarchical modes, sampling factors > 2).
    """
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")

    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffDecoder] = {}
    ac_tables: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    coef_state: "_ProgressiveState | None" = None

    pos = 2
    data = content
    while True:
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: no SOS before EOF")
        if data[pos] != 0xFF:
            raise ValueError(
                f"marker expected at byte {pos}, got 0x{data[pos]:02X}"
            )
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD8:  # stray SOI
            raise ValueError("duplicate SOI marker")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / bare RST between segments
        if marker == 0xD9:  # EOI carries no length segment
            if coef_state is not None:
                return coef_state.reconstruct(qtables)
            raise ValueError("EOI before scan data")
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError(f"bad segment length {seglen} at {pos}")
        body = data[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    if i + 64 > len(body):
                        raise ValueError("truncated DQT")
                    vals = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(body):
                        raise ValueError("truncated 16-bit DQT")
                    vals = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG_FLAT] = vals
                qtables[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[i + 17 : i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit precision JPEG not supported"
                )
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if h == 0 or w == 0:
                raise ValueError("zero image dimension in SOF")
            comps = []
            for c in range(ncomp):
                cid = body[6 + c * 3]
                hv = body[7 + c * 3]
                tq = body[8 + c * 3]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hs}x{vs} not supported"
                    )
                comps.append((cid, hs, vs, tq))
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported"
                )
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG mode SOF{marker - 0xC0} (arithmetic/lossless/"
                "hierarchical) not supported — baseline SOF0/SOF1 "
                "and progressive SOF2 only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs = body[1 + c * 2]
                tables = body[2 + c * 2]
                scan.append((cs, tables >> 4, tables & 0x0F))
            if progressive:
                ss, se = body[1 + ns * 2], body[2 + ns * 2]
                ahal = body[3 + ns * 2]
                if coef_state is None:
                    coef_state = _ProgressiveState(frame)
                pos = coef_state.decode_scan(
                    data, pos, scan, ss, se, ahal >> 4, ahal & 0x0F,
                    dc_tables, ac_tables, restart_interval,
                )
                continue
            if ns != len(frame[2]) and not (ns == 1):
                raise ValueError(
                    f"scan has {ns} components, frame has "
                    f"{len(frame[2])}"
                )
            if ns == 1 and len(frame[2]) > 1:
                raise NotImplementedError(
                    "sequential per-component (non-interleaved "
                    "multi-scan) baseline JPEG not supported — "
                    "single interleaved scan only"
                )
            return _decode_scan(
                data, pos, frame, scan, qtables, dc_tables,
                ac_tables, restart_interval,
            )
        # else: APPn/COM/unknown — skipped via seglen


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    qtables,
    dc_tables,
    ac_tables,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    non_interleaved = len(scan) == 1
    if non_interleaved:
        # single-component scan = NON-interleaved (spec A.2.2): the
        # MCU is ONE block on the component's own grid; declared
        # sampling factors only set the component's sub-grid size,
        # which for a one-component frame is the full image
        cs0 = scan[0][0]
        hs0, vs0, _ = by_id.get(cs0, (1, 1, 0))
        comp_w = (w * hs0 + hmax - 1) // hmax
        comp_h = (h * vs0 + vmax - 1) // vmax
        mcus_x = (comp_w + 7) // 8
        mcus_y = (comp_h + 7) // 8
    else:
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = (w + mcu_w - 1) // mcu_w
        mcus_y = (h + mcu_h - 1) // mcu_h

    # effective blocks-per-MCU: the component's (hs, vs) when
    # interleaved, 1x1 when non-interleaved
    eff = {
        cid: ((1, 1) if non_interleaved else (hs, vs))
        for cid, hs, vs, tq in comps
    }
    planes = {}
    for cid, hs, vs, tq in comps:
        ehs, evs = eff[cid]
        planes[cid] = np.zeros(
            (mcus_y * evs * 8, mcus_x * ehs * 8), dtype=np.float64
        )
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("scan references missing Huffman table")

    reader = _BitReader(data, pos)
    preds = {cs: 0 for cs, _, _ in scan}
    mcu_count = 0
    rst_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.sync_restart(rst_index)
                rst_index = (rst_index + 1) % 8
                preds = {cs: 0 for cs, _, _ in scan}
            for cs, td, ta in scan:
                _, _, tq = by_id[cs]
                hs, vs = eff[cs]
                qt = qtables[tq]
                for v in range(vs):
                    for u in range(hs):
                        block = _decode_block(
                            reader, dc_tables[td], ac_tables[ta],
                            qt, preds, cs,
                        )
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    return _assemble(frame, planes)


def _assemble(frame, planes: dict) -> np.ndarray:
    """Upsample each component plane to full resolution, crop to the
    frame geometry, and convert to RGB (shared by the baseline and
    progressive reconstruction paths)."""
    h, w, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    full = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([gray, gray, gray], axis=-1)
    ycc = np.stack(full, axis=-1)
    # clip Y/Cb/Cr into range before the color transform (IDCT can
    # overshoot), then convert
    ycc = np.clip(np.rint(ycc), 0, 255)
    return ycbcr_to_rgb(ycc)


def _decode_block(reader, dc_dec, ac_dec, qtable, preds, cs) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = dc_dec.decode(reader)
    if size > 11:
        raise ValueError(f"invalid DC category {size}")
    diff = _extend(reader.receive(size), size)
    preds[cs] += diff
    zz[0] = preds[cs]
    k = 1
    while k < 64:
        rs = ac_dec.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(reader.receive(size), size)
        k += 1
    coefs = np.zeros(64, dtype=np.float64)
    coefs[ZIGZAG_FLAT] = zz * qtable.flatten()[ZIGZAG_FLAT]
    block = coefs.reshape(8, 8)
    return _DCT.T @ block @ _DCT + 128.0


# --------------------------------------------------------------------------
# Progressive mode (SOF2) — spectral selection + successive approximation
# --------------------------------------------------------------------------


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past the tail of an entropy-coded segment to the next
    REAL marker (skipping stuffed 0xFF00 bytes and stray RSTn)."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if data[p + 1] == 0xFF:  # fill byte (spec B.1.1.2)
                p += 1
                continue
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("entropy-coded segment ran past end of stream")


class _ProgressiveState:
    """Accumulates DCT coefficients across a progressive JPEG's
    scans (spec Annex G): spectral-selection bands land coefficient
    ranges, successive-approximation scans land them one bit plane
    at a time. ``reconstruct`` dequantizes + IDCTs once EOI arrives.

    Coefficient arrays are zigzag-indexed ``(nby, nbx, 64)`` per
    component, sized to the MCU-padded grid (interleaved DC scans
    code padding blocks; non-interleaved scans touch only the
    component's own ``ceil(dim/8)`` prefix).
    """

    def __init__(self, frame) -> None:
        self.frame = frame
        h, w, comps = frame
        self.hmax = max(hs for _, hs, _, _ in comps)
        self.vmax = max(vs for _, _, vs, _ in comps)
        self.mcus_x = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
        self.coefs: dict = {}
        self.ni_grid: dict = {}  # non-interleaved (nby, nbx) per comp
        for cid, hs, vs, tq in comps:
            self.coefs[cid] = np.zeros(
                (self.mcus_y * vs, self.mcus_x * hs, 64), dtype=np.int64
            )
            comp_w = (w * hs + self.hmax - 1) // self.hmax
            comp_h = (h * vs + self.vmax - 1) // self.vmax
            self.ni_grid[cid] = (
                (comp_h + 7) // 8,
                (comp_w + 7) // 8,
            )

    # -- scan dispatch ----------------------------------------------------

    def decode_scan(
        self, data, pos, scan, ss, se, ah, al,
        dc_tables, ac_tables, restart_interval,
    ) -> int:
        for cs, _, _ in scan:
            if cs not in self.by_id:
                raise ValueError(
                    f"scan references unknown component {cs}"
                )
        if ss == 0:
            if se != 0:
                raise ValueError(
                    f"progressive DC scan must have Se=0 (got {se})"
                )
            reader = self._dc_scan(
                data, pos, scan, ah, al, dc_tables, restart_interval
            )
        else:
            if len(scan) != 1:
                raise ValueError(
                    "progressive AC scans are single-component "
                    f"(got {len(scan)})"
                )
            if not 1 <= ss <= se <= 63:
                raise ValueError(
                    f"bad spectral band Ss={ss}, Se={se}"
                )
            reader = self._ac_scan(
                data, pos, scan[0], ss, se, ah, al, ac_tables,
                restart_interval,
            )
        return _next_marker(data, reader.pos)

    # -- DC scans ---------------------------------------------------------

    def _dc_scan(
        self, data, pos, scan, ah, al, dc_tables, restart_interval
    ) -> _BitReader:
        reader = _BitReader(data, pos)
        preds = {cs: 0 for cs, _, _ in scan}
        rst_index = 0
        units = 0
        if len(scan) > 1:  # interleaved over MCUs
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    if (
                        restart_interval
                        and units
                        and units % restart_interval == 0
                    ):
                        reader.sync_restart(rst_index)
                        rst_index = (rst_index + 1) % 8
                        preds = {cs: 0 for cs, _, _ in scan}
                    for cs, td, _ in scan:
                        hs, vs, _ = self.by_id[cs]
                        for v in range(vs):
                            for u in range(hs):
                                self._dc_unit(
                                    reader, cs, my * vs + v,
                                    mx * hs + u, ah, al, td,
                                    dc_tables, preds,
                                )
                    units += 1
        else:  # single component: non-interleaved block grid
            cs, td, _ = scan[0]
            nby, nbx = self.ni_grid[cs]
            for by in range(nby):
                for bx in range(nbx):
                    if (
                        restart_interval
                        and units
                        and units % restart_interval == 0
                    ):
                        reader.sync_restart(rst_index)
                        rst_index = (rst_index + 1) % 8
                        preds = {cs: 0}
                    self._dc_unit(
                        reader, cs, by, bx, ah, al, td, dc_tables,
                        preds,
                    )
                    units += 1
        return reader

    def _dc_unit(
        self, reader, cs, by, bx, ah, al, td, dc_tables, preds
    ) -> None:
        if ah == 0:  # first pass: DPCM at this precision, shifted
            if td not in dc_tables:
                raise ValueError(f"missing DC Huffman table {td}")
            size = dc_tables[td].decode(reader)
            if size > 11:
                raise ValueError(f"invalid DC category {size}")
            preds[cs] += _extend(reader.receive(size), size)
            self.coefs[cs][by, bx, 0] = preds[cs] << al
        else:  # refinement: one correction bit per block
            if reader.read_bit():
                self.coefs[cs][by, bx, 0] |= 1 << al

    # -- AC scans ---------------------------------------------------------

    def _ac_scan(
        self, data, pos, comp_scan, ss, se, ah, al, ac_tables,
        restart_interval,
    ) -> _BitReader:
        cs, _, ta = comp_scan
        if ta not in ac_tables:
            raise ValueError(f"missing AC Huffman table {ta}")
        ac = ac_tables[ta]
        reader = _BitReader(data, pos)
        nby, nbx = self.ni_grid[cs]
        eobrun = 0
        rst_index = 0
        units = 0
        for by in range(nby):
            for bx in range(nbx):
                if (
                    restart_interval
                    and units
                    and units % restart_interval == 0
                ):
                    reader.sync_restart(rst_index)
                    rst_index = (rst_index + 1) % 8
                    eobrun = 0
                block = self.coefs[cs][by, bx]
                if ah == 0:
                    eobrun = self._ac_first(
                        reader, ac, block, ss, se, al, eobrun
                    )
                else:
                    eobrun = self._ac_refine(
                        reader, ac, block, ss, se, al, eobrun
                    )
                units += 1
        return reader

    @staticmethod
    def _ac_first(reader, ac, block, ss, se, al, eobrun) -> int:
        """First pass over a spectral band (G.1.2.2): run-lengths,
        EOB runs, new coefficients at precision ``al``."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = ac.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run overflows spectral band")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(reader, ac, block, ss, se, al, eobrun) -> int:
        """Refinement pass (G.1.2.3): one bit of extra precision for
        known coefficients, new +/-1<<al coefficients inserted at
        zero-history positions. Matches the spec's correction-bit
        ordering: while advancing over ``r`` ZERO-history positions,
        every nonzero-history coefficient passed emits a correction
        bit."""
        p1 = 1 << al
        m1 = -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = ac.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "AC refinement magnitude must be 1 "
                            f"(got {s})"
                        )
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    c = int(block[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            block[k] = c + (p1 if c >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval and k <= se:
                    block[k] = newval
                k += 1
        if eobrun > 0:
            # end-of-band: correction bits for remaining nonzeros
            while k <= se:
                c = int(block[k])
                if c != 0 and reader.read_bit() and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    # -- reconstruction -----------------------------------------------------

    def reconstruct(self, qtables: dict) -> np.ndarray:
        h, w, comps = self.frame
        planes = {}
        for cid, hs, vs, tq in comps:
            if tq not in qtables:
                raise ValueError(f"missing quantization table {tq}")
            qzz = qtables[tq].flatten()[ZIGZAG_FLAT].astype(np.float64)
            arr = self.coefs[cid]
            nby, nbx = arr.shape[:2]
            plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
            for by in range(nby):
                for bx in range(nbx):
                    zz = arr[by, bx] * qzz
                    nat = np.zeros(64, dtype=np.float64)
                    nat[ZIGZAG_FLAT] = zz
                    plane[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = _DCT.T @ nat.reshape(8, 8) @ _DCT + 128.0
            planes[cid] = plane
        return _assemble(self.frame, planes)


# --------------------------------------------------------------------------
# Progressive encoder (spectral selection, Ah=Al=0) — the self-test
# twin of the progressive decoder: same quantized coefficients as the
# baseline encoder, different entropy layout, so decode(progressive)
# must equal decode(baseline) PIXEL-FOR-PIXEL. Successive-approximation
# decode paths are pinned separately by hand-built streams in
# tests/test_jpeg_codec.py (an SA encoder would only test itself).
# --------------------------------------------------------------------------


def _quantized_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(h, w) uint8 plane (8-multiple dims) -> (nby, nbx, 64) int64
    zigzag-ordered quantized coefficients."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    out = np.zeros((h // 8, w // 8, 64), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            quant = np.rint((_DCT @ block @ _DCT.T) / qtable).astype(
                np.int64
            )
            out[by, bx] = quant.flatten()[ZIGZAG_FLAT]
    return out


def _flush_eobrun(writer: _BitWriter, ac_codes: dict, eobrun: int) -> int:
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, length = ac_codes[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
    return 0


def _progressive_ac_table() -> tuple[list[int], list[int]]:
    """AC Huffman spec for progressive scans: the Annex K tables lack
    the EOBn symbols (``r<<4`` for r=1..14) progressive EOB-run
    coding needs, so the encoder ships its OWN table — every (run,
    size) pair, ZRL, and EOB0..EOB14, all at code length 9 (176
    codes < 2^9 with the all-ones code free; flat lengths keep the
    canonical construction trivially valid). Also means the decoder
    gets exercised against a non-Annex-K DHT."""
    vals = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {0xF0}
        | {r << 4 for r in range(15)}
    )
    bits = [0] * 16
    bits[8] = len(vals)  # all codes 9 bits long
    return bits, vals


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 50,
    bands: tuple = ((1, 5), (6, 63)),
    restart_interval: int = 0,
) -> bytes:
    """Encode grayscale or 4:4:4 RGB as a PROGRESSIVE (SOF2) JPEG
    using spectral selection: one interleaved DC scan, then per
    component one AC scan per ``bands`` entry, with spec-conforming
    EOB-run coding across blocks. Quantized coefficients are
    IDENTICAL to :func:`encode_jpeg` at the same quality, so the two
    streams must decode to the same pixels — the cross-layout
    equality the progressive decoder tests lean on."""
    if arr.ndim == 2:
        gray = True
    elif arr.ndim == 3 and arr.shape[2] == 3:
        gray = False
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) array, got {arr.shape}")
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"image dimensions out of JPEG range: {h}x{w}")
    for ks, ke in bands:
        if not 1 <= ks <= ke <= 63:
            raise ValueError(f"bad spectral band ({ks}, {ke})")

    ql = scale_quant_table(QUANT_LUMA, quality)
    qc = scale_quant_table(QUANT_CHROMA, quality)
    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_bits, ac_vals = _progressive_ac_table()
    ac_codes = [_build_codes(ac_bits, ac_vals)] * 2

    if gray:
        planes = [_pad_edge_to_blocks(arr, 8, 8)]
    else:
        ycc = rgb_to_ycbcr(arr)
        planes = [
            _pad_edge_to_blocks(ycc[..., c], 8, 8) for c in range(3)
        ]
    coefs = [
        _quantized_blocks(p, ql if i == 0 else qc)
        for i, p in enumerate(planes)
    ]
    nby, nbx = coefs[0].shape[:2]

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytearray()
    sof += struct.pack(">BHHB", 8, h, w, len(planes))
    for i in range(len(planes)):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + bytes(sof)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, ac_bits, ac_vals)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, ac_bits, ac_vals)

    def sos_header(comp_ids_tables: list, ss: int, se: int) -> bytes:
        body = bytearray([len(comp_ids_tables)])
        for cid, tbl in comp_ids_tables:
            body += bytes([cid, tbl])
        body += bytes([ss, se, 0x00])  # Ah=Al=0
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + bytes(
            body
        )

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # scan 1: interleaved DC, all components
    out += sos_header(
        [(i + 1, (0x00 if i == 0 else 0x11)) for i in
         range(len(planes))],
        0, 0,
    )
    writer = _BitWriter()
    preds = [0] * len(planes)
    units = 0
    rst = 0
    for by in range(nby):
        for bx in range(nbx):
            if (
                restart_interval
                and units
                and units % restart_interval == 0
            ):
                out += writer.flush()
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                dc = int(coefs[ci][by, bx, 0])
                diff = dc - preds[ci]
                preds[ci] = dc
                size = _category(diff)
                tbl = dc_codes[0 if ci == 0 else 1]
                code, length = tbl[size]
                writer.write(code, length)
                if size:
                    mag = diff if diff >= 0 else diff + (1 << size) - 1
                    writer.write(mag & ((1 << size) - 1), size)
            units += 1
    out += writer.flush()

    # AC scans: per component, per band, non-interleaved with EOBRUN
    for ci in range(len(planes)):
        act = ac_codes[0 if ci == 0 else 1]
        for ks, ke in bands:
            out += sos_header(
                [(ci + 1, (0x00 if ci == 0 else 0x01))], ks, ke
            )
            writer = _BitWriter()
            eobrun = 0
            units = 0
            rst = 0
            for by in range(nby):
                for bx in range(nbx):
                    if (
                        restart_interval
                        and units
                        and units % restart_interval == 0
                    ):
                        # EOB runs cannot cross a restart boundary
                        eobrun = _flush_eobrun(writer, act, eobrun)
                        out += writer.flush()
                        writer = _BitWriter()
                        out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                    units += 1
                    zz = coefs[ci][by, bx]
                    nz = [
                        k for k in range(ks, ke + 1) if zz[k] != 0
                    ]
                    if not nz:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            eobrun = _flush_eobrun(
                                writer, act, eobrun
                            )
                        continue
                    eobrun = _flush_eobrun(writer, act, eobrun)
                    run = 0
                    for k in range(ks, nz[-1] + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = act[0xF0]
                            writer.write(code, length)
                            run -= 16
                        s = _category(v)
                        code, length = act[(run << 4) | s]
                        writer.write(code, length)
                        mag = v if v >= 0 else v + (1 << s) - 1
                        writer.write(mag & ((1 << s) - 1), s)
                        run = 0
                    if nz[-1] < ke:
                        eobrun = 1  # this block's tail is an EOB
            _flush_eobrun(writer, act, eobrun)
            out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)
