"""Property-based tests for the portable roaring / deletion-vector codec."""

from hypothesis import given, settings, strategies as st

from iceberg_rust_spark.sources.puffin import deserialize_dv, serialize_dv

positions = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**16),          # array containers
        st.integers(min_value=0, max_value=2**32 + 2**16),  # high-key crossing
        st.integers(min_value=0, max_value=2**40),          # multi-map
    ),
    min_size=0, max_size=2000)


@given(positions)
@settings(max_examples=200, deadline=None)
def test_dv_roundtrip_property(ps):
    assert deserialize_dv(serialize_dv(ps)).tolist() == sorted(set(ps))


@given(st.integers(min_value=0, max_value=2**16 - 1),
       st.integers(min_value=4000, max_value=9000))
@settings(max_examples=10, deadline=None)
def test_dv_dense_container_boundary(start, n):
    """Straddles the 4096-cardinality array->bitmap container switch."""
    ps = list(range(start, start + n))
    assert deserialize_dv(serialize_dv(ps)).tolist() == ps
