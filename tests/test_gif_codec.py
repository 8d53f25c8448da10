"""GIF codec tests (``operators/gif_codec.py``): LZW round-trips,
the 89a animation model (sub-rectangles, transparency, disposal,
delays), interlacing, error contracts, the decode_image /
decode_frames integration, and hypothesis fuzz.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from building_energy_data_pipeline_spark.operators import gif_codec as gc

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 100, 50]],
    dtype=np.uint8,
)


class TestLzw:
    def test_round_trip_with_dictionary_growth(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 5, 9000, dtype=np.uint8).tobytes()
        enc = gc._lzw_encode(data, 3)
        assert gc._lzw_decode(enc, 3, len(data)) == data
        assert len(enc) < len(data)  # it actually compresses

    def test_repetitive_input_compresses_hard(self):
        data = bytes([1, 2] * 5000)
        enc = gc._lzw_encode(data, 2)
        assert gc._lzw_decode(enc, 2, len(data)) == data
        assert len(enc) < len(data) // 10

    def test_kwkwk_case(self):
        # the classic LZW edge: code referencing the entry being built
        data = b"\x01\x01\x01\x01\x01\x01\x01"
        enc = gc._lzw_encode(data, 2)
        assert gc._lzw_decode(enc, 2, len(data)) == data

    def test_truncation_is_valueerror(self):
        data = bytes(range(5)) * 100
        enc = gc._lzw_encode(data, 3)
        with pytest.raises(ValueError):
            gc._lzw_decode(enc[: len(enc) // 3], 3, len(data))


class TestDecodeGif:
    def test_single_frame_round_trip(self):
        idx = (np.arange(20 * 13) % 5).astype(np.uint8).reshape(20, 13)
        frames, delays = gc.decode_gif(gc.encode_gif([idx], PAL))
        assert len(frames) == 1
        assert np.array_equal(frames[0], PAL[idx])

    def test_interlaced_round_trip(self):
        for h in (1, 2, 5, 8, 17):
            idx = (np.arange(h * 9) % 5).astype(np.uint8).reshape(h, 9)
            frames, _ = gc.decode_gif(
                gc.encode_gif([idx], PAL, interlace=True)
            )
            assert np.array_equal(frames[0], PAL[idx]), h

    def test_animation_composites_subrectangles(self):
        f0 = np.zeros((10, 10), dtype=np.uint8)
        f1 = np.full((4, 4), 2, dtype=np.uint8)
        f1[0, 0] = 1  # transparent hole
        gif = gc.encode_gif(
            [f0, f1], PAL, delays_ms=[100, 50],
            rects=[(0, 0), (3, 2)], screen=(10, 10), transparent=1,
        )
        frames, delays = gc.decode_gif(gif)
        assert delays == [100, 50]
        want1 = PAL[f0].copy()
        want2 = want1.copy()
        mask = f1 != 1
        want2[2:6, 3:7][mask] = PAL[f1][mask]
        assert np.array_equal(frames[0], want1)
        assert np.array_equal(frames[1], want2)

    def test_disposal_two_restores_background(self):
        gif = gc.encode_gif(
            [np.full((4, 4), 2, np.uint8), np.full((2, 2), 3, np.uint8)],
            PAL, rects=[(0, 0), (1, 1)], screen=(4, 4), disposal=2,
        )
        frames, _ = gc.decode_gif(gif)
        exp = np.tile(PAL[0], (4, 4, 1))
        exp[1:3, 1:3] = PAL[3]
        assert np.array_equal(frames[1], exp)

    def test_disposal_three_restores_previous(self):
        """Disposal 3 (restore to previous): the frame's pixels are
        rolled back before the NEXT frame draws — frame 3 must not
        see frame 2's rectangle."""
        f0 = np.full((4, 4), 1, dtype=np.uint8)
        f1 = np.full((2, 2), 2, dtype=np.uint8)
        f2 = np.full((1, 1), 3, dtype=np.uint8)
        g = bytearray(gc.encode_gif(
            [f0, f1, f2], PAL, rects=[(0, 0), (1, 1), (0, 0)],
            screen=(4, 4), disposal=1,
        ))
        first = g.find(b"\x21\xf9")
        second = g.find(b"\x21\xf9", first + 2)
        g[second + 3] = (g[second + 3] & ~0x1C) | (3 << 2)
        frames, _ = gc.decode_gif(bytes(g))
        exp2 = PAL[f0].copy()
        exp2[1:3, 1:3] = PAL[2]
        exp3 = PAL[f0].copy()
        exp3[0, 0] = PAL[3]
        assert np.array_equal(frames[1], exp2)
        assert np.array_equal(frames[2], exp3)  # f1's pixels gone

    def test_error_contract(self):
        with pytest.raises(ValueError, match="not a GIF"):
            gc.decode_gif(b"NOTGIF")
        with pytest.raises(ValueError, match="truncated"):
            gc.decode_gif(b"GIF89a\x00\x00\x00")
        idx = np.zeros((4, 4), dtype=np.uint8)
        # frame rectangle outside the logical screen
        with pytest.raises(ValueError, match="outside"):
            gc.decode_gif(
                gc.encode_gif([idx], PAL, rects=[(3, 3)], screen=(4, 4))
            )
        # encoder input validation
        with pytest.raises(ValueError, match="zero frames"):
            gc.encode_gif([], PAL)
        with pytest.raises(ValueError, match="outside the palette"):
            gc.encode_gif([np.full((2, 2), 9, np.uint8)], PAL)

    def test_decode_image_sniffs_gif(self):
        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_image,
        )

        idx = (np.arange(8 * 8) % 5).astype(np.uint8).reshape(8, 8)
        got = decode_image(
            gc.encode_gif([idx], PAL), use_real_codec=True
        )
        assert np.array_equal(got, PAL[idx])


class TestHypothesisFuzz:
    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        n_colors=st.integers(1, 5),
        interlace=st.booleans(),
    )
    def test_indexed_round_trip_always_exact(
        self, seed, h, w, n_colors, interlace
    ):
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
        frames, _ = gc.decode_gif(
            gc.encode_gif([idx], PAL, interlace=interlace)
        )
        assert np.array_equal(frames[0], PAL[idx])

    @settings(max_examples=10, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        n_frames=st.integers(2, 5),
    )
    def test_full_frame_animation_last_frame_wins(self, seed, n_frames):
        rng = np.random.default_rng(seed)
        frames_idx = [
            rng.integers(0, 5, (9, 7), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        frames, _ = gc.decode_gif(gc.encode_gif(frames_idx, PAL))
        assert len(frames) == n_frames
        for got, idx in zip(frames, frames_idx):
            assert np.array_equal(got, PAL[idx])


@pytest.mark.usefixtures("spark")
class TestDistributed:
    def test_decode_frames_handles_gif_and_avi(self, spark):
        """The frame extractor sniffs the container per payload: one
        GIF animation and one MJPEG AVI in the same DataFrame."""
        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_frames,
            encode_avi_mjpeg,
        )

        gif_frames = [
            (np.arange(8 * 8, dtype=np.uint8) % 5).reshape(8, 8),
            np.full((8, 8), 3, dtype=np.uint8),
        ]
        gif_payload = gc.encode_gif(gif_frames, PAL)

        y, x = np.ogrid[0:8, 0:8]
        avi_frames = [
            (2 * ((9 * 7 + f * 13 + (y // 8) * 5 + (x // 8) * 3) % 128))
            .astype(np.uint8)
            for f in range(3)
        ]
        avi_payload = encode_avi_mjpeg(avi_frames, fps=10)

        df = spark.createDataFrame(
            [(1, bytearray(gif_payload)), (2, bytearray(avi_payload))],
            "media_id long, content binary",
        ).repartition(2)
        rows = decode_frames(df, use_real_codec=True).collect()
        got = {(r["media_id"], r["frame_idx"]): r for r in rows}
        assert len(got) == 5
        # GIF frame 0 pixels
        r = got[(1, 0)]
        arr = np.frombuffer(bytes(r["content"]), np.uint8).reshape(
            r["height"], r["width"], 3
        )
        assert np.array_equal(arr, PAL[gif_frames[0]])
        # AVI frame 2 pixels (lossless subspace)
        r = got[(2, 2)]
        arr = np.frombuffer(bytes(r["content"]), np.uint8).reshape(
            r["height"], r["width"], 3
        )
        assert np.array_equal(arr[..., 0], avi_frames[2])
