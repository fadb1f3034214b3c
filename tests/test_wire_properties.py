"""Property tests (hypothesis) for the wire-format integer kernels:
the o5m signed/unsigned varints and the PBF zigzag/packed encoders
must round-trip through the corresponding readers for the full
64-bit value ranges."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from osmgraft.sources.o5m import _Buf
from osmgraft.sources.pbf import _delta_zig, _packed_varints
from osmgraft.wire.o5m import _sv, _uv
from osmgraft.wire.pbf import _packed_delta_zig


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
@settings(max_examples=300)
def test_o5m_uvarint_roundtrip(v):
    out = bytearray()
    _uv(out, v)
    assert _Buf(bytes(out)).uint() == v


@given(st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1))
@settings(max_examples=300)
def test_o5m_svarint_roundtrip(v):
    out = bytearray()
    _sv(out, v)
    assert _Buf(bytes(out)).sint() == v


@given(
    st.lists(
        st.integers(min_value=-(1 << 40), max_value=(1 << 40)),
        max_size=40,
    )
)
@settings(max_examples=200)
def test_pbf_delta_zigzag_roundtrip(values):
    packed = _packed_delta_zig(values)
    assert _delta_zig(_packed_varints(packed)) == values
