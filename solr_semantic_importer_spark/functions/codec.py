"""Delta-gap + LEB128-varint posting-list codec, numpy-vectorized.

The Spark analog of Lucene's postings compression (the format behind every
``indexed="true"`` field the importer's managed-schema declares,
default-base-config/managed-schema.xml:113-167). No Spark builtin exists
(SURVEY.md section 4.2), so this is a pure-numpy kernel used inside Arrow
pandas UDFs: postings sorted by doc_id -> first-difference (delta-gap) ->
LEB128 varint pack into one ``bytes`` cell per (term, block).

Encoding: little-endian base-128; 7 payload bits per byte, MSB = continuation.
Vectorized: each uint64 value is split into its (up to 10) 7-bit groups with
shifts, a byte-count per value is computed from bit_length, and the output is
scattered into one preallocated byte buffer -- no per-value Python loop.
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 10  # ceil(64 / 7)
_SHIFTS = np.arange(_MAX_GROUPS, dtype=np.uint64) * np.uint64(7)


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a 1-D array; also return bytes-per-value.

    The length vector lets a caller encode MANY logical blocks in ONE
    vectorized pass and then slice the shared buffer per block
    (np.add.reduceat over block starts) -- the trick that makes the
    partition-level posting encoder free of per-block encode calls.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    groups = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1) << np.uint64(7)
    tmp = v.copy()
    while True:
        more = tmp >= thresh
        if not more.any():
            break
        groups[more] += 1
        tmp = tmp >> np.uint64(7)
    total = int(groups.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(groups)[:-1]))
    for g in range(_MAX_GROUPS):
        mask = groups > g
        if not mask.any():
            break
        byte = ((v[mask] >> _SHIFTS[g]) & np.uint64(0x7F)).astype(np.uint8)
        cont = (groups[mask] > (g + 1)).astype(np.uint8) << 7
        out[starts[mask] + g] = byte | cont
    return out.tobytes(), groups


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a 1-D array of non-negative ints (any int dtype)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value: max(1, ceil(bit_length / 7)),
    # computed with <=9 whole-array shift passes (no per-value Python)
    groups = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1) << np.uint64(7)
    tmp = v.copy()
    while True:
        more = tmp >= thresh
        if not more.any():
            break
        groups[more] += 1
        tmp = tmp >> np.uint64(7)
    total = int(groups.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of each value's first output byte
    starts = np.concatenate(([0], np.cumsum(groups)[:-1]))
    for g in range(_MAX_GROUPS):
        mask = groups > g
        if not mask.any():
            break
        byte = ((v[mask] >> _SHIFTS[g]) & np.uint64(0x7F)).astype(np.uint8)
        cont = (groups[mask] > (g + 1)).astype(np.uint8) << 7
        out[starts[mask] + g] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    n = ends.size
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (b & 0x7F).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    # group index of each byte within its value
    idx = np.arange(b.size, dtype=np.int64)
    group = idx - np.repeat(starts, ends - starts + 1)
    np.add.at(out, np.repeat(np.arange(n), ends - starts + 1), payload << (group.astype(np.uint64) * np.uint64(7)))
    if count is not None and n != count:
        raise ValueError(f"decoded {n} values, expected {count}")
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing doc ids -> gaps (first value kept absolute)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    if a.size > 1 and out[1:].min() <= 0:
        raise ValueError("doc ids must be strictly increasing")
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64)).astype(np.int64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) -> (gap varint bytes, tf varint bytes)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(tfs)


def decode_postings(gap_buf: bytes, tf_buf: bytes, count: int) -> tuple[np.ndarray, np.ndarray]:
    docs = delta_decode(varint_decode(gap_buf, count))
    tfs = varint_decode(tf_buf, count).astype(np.int64)
    return docs, tfs
