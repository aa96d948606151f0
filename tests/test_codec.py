"""Property tests: varint/delta codec round-trips (SURVEY section 5.2 item 1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_semantic_importer_spark.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


def test_varint_known_bytes():
    # 0 -> 00; 127 -> 7f; 128 -> 80 01; 300 -> ac 02 (LEB128 reference vectors)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert list(delta_decode(delta_encode(arr))) == sorted(ids)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda x: x[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(pairs):
    pairs.sort()
    docs = np.array([d for d, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    g, t = encode_postings(docs, tfs)
    d2, t2 = decode_postings(g, t, len(pairs))
    assert list(d2) == list(docs)
    assert list(t2) == list(tfs)
