"""FLAC codec tests (``operators/flac_codec.py``) — the fourth
compression family on the real decode path and the first LOSSLESS
audio one: bit-exact round-trips on arbitrary input (no subspace
argument), stereo decorrelation modes, the container's own
integrity layers (CRC-8/CRC-16/MD5) as corruption tripwires, header
anatomy, and hypothesis fuzz.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from building_energy_data_pipeline_spark.operators import flac_codec as fc


class TestRoundTrip:
    def test_mono_shapes(self):
        rng = np.random.default_rng(5)
        cases = [
            rng.integers(-32768, 32768, 5000).astype(np.int16),
            (np.sin(np.arange(4000) / 20) * 12000).astype(np.int16),
            np.full(300, -123, dtype=np.int16),  # CONSTANT subframes
            rng.integers(-100, 100, 17).astype(np.int16),  # < block
            np.array([32767, -32768, 0, 1, -1], dtype=np.int16),
        ]
        for x in cases:
            dec, rate, bits = fc.decode_flac(
                fc.encode_flac(x, 16000, block_size=1024)
            )
            assert rate == 16000 and bits == 16
            assert np.array_equal(dec[:, 0], x)

    def test_stereo_both_decorrelations(self):
        rng = np.random.default_rng(7)
        st_sig = np.stack(
            [
                (np.sin(np.arange(3000) / 15) * 9000).astype(np.int16),
                rng.integers(-2000, 2000, 3000).astype(np.int16),
            ],
            axis=-1,
        )
        for ms in (True, False):
            dec, _, _ = fc.decode_flac(
                fc.encode_flac(
                    st_sig, 44100, block_size=512, mid_side=ms
                )
            )
            assert np.array_equal(dec, st_sig.astype(np.int32))

    def test_extreme_side_channel(self):
        """Mid/side's side channel needs bps+1 bits — pin the
        extreme where left/right sit at opposite int16 rails."""
        st_sig = np.stack(
            [
                np.full(100, 32767, dtype=np.int16),
                np.full(100, -32768, dtype=np.int16),
            ],
            axis=-1,
        )
        dec, _, _ = fc.decode_flac(
            fc.encode_flac(st_sig, 8000, mid_side=True)
        )
        assert np.array_equal(dec, st_sig.astype(np.int32))

    def test_multiple_frames_and_odd_tail(self):
        rng = np.random.default_rng(11)
        x = rng.integers(-5000, 5000, 3333).astype(np.int16)
        dec, _, _ = fc.decode_flac(
            fc.encode_flac(x, 22050, block_size=256)
        )
        assert np.array_equal(dec[:, 0], x)

    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(1, 3000),
        block=st.sampled_from([64, 192, 1024]),
        stereo=st.booleans(),
    )
    @settings(max_examples=25, deadline=None)
    def test_fuzz_bit_exact(self, seed, n, block, stereo):
        rng = np.random.default_rng(seed)
        shape = (n, 2) if stereo else (n,)
        x = rng.integers(-32768, 32768, shape).astype(np.int16)
        dec, _, _ = fc.decode_flac(
            fc.encode_flac(x, 16000, block_size=block)
        )
        want = x.reshape(n, -1).astype(np.int32)
        assert np.array_equal(dec, want)


class TestContainerAnatomy:
    def test_stream_marker_and_streaminfo(self):
        x = np.zeros(100, dtype=np.int16)
        enc = fc.encode_flac(x, 12345)
        assert enc[:4] == b"fLaC"
        assert enc[4] == 0x80  # last-metadata STREAMINFO
        dec, rate, bits = fc.decode_flac(enc)
        assert (rate, bits, len(dec)) == (12345, 16, 100)

    def test_compression_on_smooth_content(self):
        smooth = (np.sin(np.arange(20000) / 30) * 15000).astype(
            np.int16
        )
        enc = fc.encode_flac(smooth)
        assert len(enc) < len(smooth) * 2 * 0.4  # > 2.5x smaller

    def test_utf8_frame_numbers_round_trip(self):
        """> 127 frames forces multi-byte UTF-8-style numbers."""
        rng = np.random.default_rng(13)
        x = rng.integers(-300, 300, 140 * 64).astype(np.int16)
        dec, _, _ = fc.decode_flac(
            fc.encode_flac(x, 8000, block_size=64)
        )
        assert np.array_equal(dec[:, 0], x)

    def test_streaminfo_blocksize_bounds_short_stream(self):
        """ADVICE r10 #1: a stream shorter than one block must still
        write a conformant STREAMINFO — min_blocksize == max_blocksize
        == the nominal block size (the spec lets the LAST frame run
        short without shrinking these fields), never a max below the
        min or below the spec floor of 16."""
        import struct

        x = np.arange(7, dtype=np.int16)  # n_total=7 < block_size
        enc = fc.encode_flac(x, 8000, block_size=4096)
        mn, mx = struct.unpack_from(">HH", enc, 8)
        assert mn == mx == 4096
        assert mn >= 16
        dec, _, _ = fc.decode_flac(enc)
        assert np.array_equal(dec[:, 0], x)

    def test_crc_tables_spec_anchors(self):
        # public CRC anchors: CRC-8/0x07 and CRC-16/0x8005 of "123456789"
        assert fc._crc8(b"123456789") == 0xF4
        assert fc._crc16(b"123456789") == 0xFEE8


class TestCorruptionContract:
    def _enc(self) -> bytes:
        rng = np.random.default_rng(17)
        return fc.encode_flac(
            rng.integers(-1000, 1000, 2000).astype(np.int16)
        )

    def test_bit_flip_caught(self):
        enc = bytearray(self._enc())
        enc[len(enc) // 2] ^= 0x40
        with pytest.raises(ValueError):
            fc.decode_flac(bytes(enc))

    def test_not_flac(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            fc.decode_flac(b"RIFFxxxxWAVE")

    def test_truncation_caught(self):
        enc = self._enc()
        with pytest.raises(ValueError):
            fc.decode_flac(enc[: len(enc) // 2])

    def test_md5_guard(self):
        """Rewrite STREAMINFO's sample count + MD5 consistently
        wrong: the decoder's MD5 re-check must trip even when all
        frame CRCs pass."""
        enc = bytearray(self._enc())
        # STREAMINFO MD5 lives at bytes 4+4+18 .. +34
        enc[4 + 4 + 18] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            fc.decode_flac(bytes(enc))

    def test_encoder_validation(self):
        with pytest.raises(ValueError, match="int16"):
            fc.encode_flac(np.zeros(10, dtype=np.int32))
        with pytest.raises(ValueError, match="empty"):
            fc.encode_flac(np.zeros(0, dtype=np.int16))
        with pytest.raises(ValueError, match="block size"):
            fc.encode_flac(
                np.zeros(10, dtype=np.int16), block_size=8
            )
        with pytest.raises(ValueError, match="samples"):
            fc.encode_flac(np.zeros((5, 3), dtype=np.int16))
