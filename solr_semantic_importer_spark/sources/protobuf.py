"""Dependency-free protobuf wire-format decode + Solr-style flattening (S5).

Reference semantics: ProtobufToSolrDocument.java:22-155 converts arbitrary
protobuf messages to flat SolrInputDocuments --

- nested message fields recurse with ``parent_child`` underscore-joined names
  (handleField/addFieldsToSolrDoc, :41-55,74),
- repeated fields add one value per item -> an array here (:77-82),
- map fields become ``field_<key>`` suffixed entries (:84-90),
- google.protobuf.Timestamp -> epoch millis -> Date (:121-128); emitted here
  as the engine's canonical ISO-8601 millis string (P3 normalize format,
  SolrSemanticIndexer.java:244-276),
- google.protobuf.Duration -> java.time.Duration.toString() ISO form
  (:114-119), e.g. PT1M40.5S,
- BytesValue -> UTF-8 string (:108-112), Empty -> "__EMPTY__" (:100-103),
  FieldMask -> comma-joined paths (:92-98).

No protobuf runtime exists in this environment, so both the WIRE PARSER and
a test-side encoder are implemented from the public wire spec: varint keys
(field_number << 3 | wire_type), wire types 0 varint / 1 fixed64 /
2 length-delimited / 5 fixed32, zigzag for sint*, little-endian IEEE754 for
float/double, packed repeated scalars, last-one-wins for duplicated
singular fields, unknown fields skipped (proto3 rules).

Spark integration: :func:`decode_protobuf_column` runs the decoder as an
Arrow-batched kernel emitting the flattened dict as a JSON string column, so
the caller parses it with an explicit schema via the existing S4 machinery
(operators/transforms.parse_json_docs) -- map-key-suffixed names make the
output schema data-dependent, exactly like Solr's dynamic fields.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SCALARS = {
    "int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool",
    "enum", "string", "bytes", "double", "float", "fixed64", "fixed32",
}
_VARINT_KINDS = {"int32", "int64", "uint32", "uint64", "sint32", "sint64",
                 "bool", "enum"}


@dataclass
class FieldSpec:
    number: int
    name: str
    kind: str  # scalar kind | "message" | "map" | "timestamp" | "duration"
    repeated: bool = False
    message: "MessageSpec | None" = None  # kind == "message"
    map_key: str = "string"               # kind == "map"
    map_value: str = "string"             # scalar kinds only (or "message")
    map_value_message: "MessageSpec | None" = None


@dataclass
class MessageSpec:
    name: str
    fields: list[FieldSpec] = field(default_factory=list)

    def by_number(self) -> dict[int, FieldSpec]:
        return {f.number: f for f in self.fields}


# google.protobuf well-known shapes (public descriptors)
TIMESTAMP_SPEC = MessageSpec(
    "google.protobuf.Timestamp",
    [FieldSpec(1, "seconds", "int64"), FieldSpec(2, "nanos", "int32")],
)
DURATION_SPEC = MessageSpec(
    "google.protobuf.Duration",
    [FieldSpec(1, "seconds", "int64"), FieldSpec(2, "nanos", "int32")],
)


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int) -> int:
    if v >= 1 << (bits - 1):
        v -= 1 << bits
    return v


def _scalar_from_varint(kind: str, v: int):
    if kind in ("sint32", "sint64"):
        return _zigzag_decode(v)
    if kind in ("int32", "int64"):
        return _to_signed(v & ((1 << 64) - 1), 64)
    if kind == "bool":
        return bool(v)
    return v  # uint*/enum


def _skip(buf: bytes, i: int, wire_type: int) -> int:
    if wire_type == 0:
        _, i = _read_varint(buf, i)
        return i
    if wire_type == 1:
        return i + 8
    if wire_type == 2:
        n, i = _read_varint(buf, i)
        return i + n
    if wire_type == 5:
        return i + 4
    raise ValueError(f"unsupported wire type {wire_type}")


def decode_message(spec: MessageSpec, buf: bytes) -> dict:
    """Wire bytes -> {field_name: python value} (unflattened; nested dicts,
    repeated lists, map dicts). Unknown field numbers are skipped."""
    fields = spec.by_number()
    out: dict = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        number, wt = key >> 3, key & 7
        f = fields.get(number)
        if f is None:
            i = _skip(buf, i, wt)
            continue
        if wt == 2:
            n, i = _read_varint(buf, i)
            chunk = bytes(buf[i : i + n])
            i += n
            val = _decode_len_delimited(f, chunk, out)
            if val is _HANDLED:
                continue
        elif wt == 0:
            v, i = _read_varint(buf, i)
            val = _scalar_from_varint(f.kind, v)
        elif wt == 1:
            (val,) = struct.unpack("<d" if f.kind == "double" else "<q", buf[i : i + 8])
            i += 8
        elif wt == 5:
            (val,) = struct.unpack("<f" if f.kind == "float" else "<i", buf[i : i + 4])
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        if f.repeated:
            out.setdefault(f.name, []).append(val)
        else:
            out[f.name] = val  # proto3: last one wins
    return out


_HANDLED = object()


def _decode_len_delimited(f: FieldSpec, chunk: bytes, out: dict):
    if f.kind == "string":
        return chunk.decode("utf-8")
    if f.kind == "bytes":
        return chunk
    if f.kind == "message":
        return decode_message(f.message, chunk)
    if f.kind == "timestamp":
        d = decode_message(TIMESTAMP_SPEC, chunk)
        millis = d.get("seconds", 0) * 1000 + d.get("nanos", 0) // 1_000_000
        return _iso_millis(millis)
    if f.kind == "duration":
        d = decode_message(DURATION_SPEC, chunk)
        return _java_duration(d.get("seconds", 0), d.get("nanos", 0))
    if f.kind == "map":
        entry = MessageSpec(
            "entry",
            [
                FieldSpec(1, "key", f.map_key),
                FieldSpec(2, "value", f.map_value, message=f.map_value_message),
            ],
        )
        e = decode_message(entry, chunk)
        out.setdefault(f.name, {})[e.get("key")] = e.get("value")
        return _HANDLED
    if f.kind in _VARINT_KINDS:  # packed repeated scalars
        vals, i = [], 0
        while i < len(chunk):
            v, i = _read_varint(chunk, i)
            vals.append(_scalar_from_varint(f.kind, v))
        if f.repeated:
            out.setdefault(f.name, []).extend(vals)
            return _HANDLED
        return vals[-1] if vals else None
    raise ValueError(f"cannot decode length-delimited {f.kind}")


def _iso_millis(millis: int) -> str:
    """Epoch millis -> the engine's canonical ISO form (transforms.ISO_MILLIS)."""
    from datetime import datetime, timezone

    sec, ms = divmod(millis, 1000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ms:03d}Z"


def _java_duration(seconds: int, nanos: int) -> str:
    """Exact java.time.Duration.toString() (the reference formats durations
    via Duration.ofSeconds(s, n).toString(), ProtobufToSolrDocument.java:
    114-119): per-component signs ('PT-1M-40.5S', never '-PT1M40.5S') and
    pure-integer arithmetic, so nanos keep full precision at any magnitude.
    """
    # Duration.ofSeconds(seconds, nanoAdjustment) floor-normalizes nanos
    # into [0, 1e9) (protobuf encodes negative durations with same-sign
    # seconds/nanos; integer math keeps this lossless)
    total_ns = seconds * 1_000_000_000 + nanos
    jsec, jnan = divmod(total_ns, 1_000_000_000)  # floor division
    if jsec == 0 and jnan == 0:
        return "PT0S"

    def _tdiv(a: int, b: int) -> int:  # Java '/': truncate toward zero
        return a // b if (a >= 0) == (b >= 0) else -((-a) // b)

    eff = jsec + 1 if (jsec < 0 and jnan > 0) else jsec
    hours = _tdiv(eff, 3600)
    minutes = _tdiv(eff - hours * 3600, 60)
    secs = eff - hours * 3600 - minutes * 60  # == eff % 60, Java semantics
    buf = "PT"
    if hours:
        buf += f"{hours}H"
    if minutes:
        buf += f"{minutes}M"
    if secs == 0 and jnan == 0 and len(buf) > 2:
        return buf
    if jsec < 0 and jnan > 0 and secs == 0:
        buf += "-0"
    else:
        buf += str(secs)
    if jnan > 0:
        frac = 2_000_000_000 - jnan if jsec < 0 else 1_000_000_000 + jnan
        buf += "." + str(frac)[1:].rstrip("0")
    return buf + "S"


# ---------------------------------------------------------------------------
# Solr-style flattening (ProtobufToSolrDocument semantics)
# ---------------------------------------------------------------------------

def flatten_decoded(spec: MessageSpec, decoded: dict, prefix: str = "") -> dict:
    """Nested decode result -> flat {solr_field: value} with underscore-joined
    nested names, arrays for repeated, key-suffixed map entries."""
    out: dict = {}
    by_name = {f.name: f for f in spec.fields}
    for name, val in decoded.items():
        f = by_name[name]
        fname = f"{prefix}_{name}" if prefix else name
        if f.kind == "message" and not f.repeated:
            out.update(flatten_decoded(f.message, val, fname))
        elif f.kind == "message" and f.repeated:
            out[fname] = [flatten_decoded(f.message, v) for v in val]
        elif f.kind == "map":
            for k, v in val.items():
                out[f"{fname}_{k}"] = v
        else:
            out[fname] = val
    return out


def decode_flat(spec: MessageSpec, buf: bytes) -> dict:
    return flatten_decoded(spec, decode_message(spec, buf))


# ---------------------------------------------------------------------------
# test-side encoder (hand-rolled; used by fixtures and the oracle entry)
# ---------------------------------------------------------------------------

def _write_varint(v: int, out: bytearray) -> None:
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _encode_scalar(f_kind: str, v) -> tuple[int, bytes]:
    """-> (wire_type, payload)."""
    out = bytearray()
    if f_kind in ("sint32", "sint64"):
        _write_varint((v << 1) ^ (v >> 63), out)
        return 0, bytes(out)
    if f_kind in _VARINT_KINDS:
        _write_varint(int(v), out)
        return 0, bytes(out)
    if f_kind == "double":
        return 1, struct.pack("<d", v)
    if f_kind == "fixed64":
        return 1, struct.pack("<q", v)
    if f_kind == "float":
        return 5, struct.pack("<f", v)
    if f_kind == "fixed32":
        return 5, struct.pack("<i", v)
    if f_kind == "string":
        return 2, v.encode("utf-8")
    if f_kind == "bytes":
        return 2, bytes(v)
    raise ValueError(f_kind)


def encode_message(spec: MessageSpec, values: dict) -> bytes:
    """Encode {field_name: value} (nested dicts / lists / maps) to wire
    bytes, fields in declaration order. Timestamps take epoch millis."""
    out = bytearray()

    def emit(f: FieldSpec, v) -> None:
        if f.kind == "message":
            payload = encode_message(f.message, v)
            wt = 2
        elif f.kind == "timestamp":
            payload = encode_message(
                TIMESTAMP_SPEC,
                {"seconds": int(v) // 1000, "nanos": (int(v) % 1000) * 1_000_000},
            )
            wt = 2
        elif f.kind == "duration":
            payload = encode_message(
                DURATION_SPEC, {"seconds": v[0], "nanos": v[1]}
            )
            wt = 2
        else:
            wt, payload = _encode_scalar(f.kind, v)
        _write_varint((f.number << 3) | wt, out)
        if wt == 2:
            _write_varint(len(payload), out)
        out.extend(payload)

    for f in spec.fields:
        if f.name not in values or values[f.name] is None:
            continue
        v = values[f.name]
        if f.kind == "map":
            entry = MessageSpec(
                "entry",
                [
                    FieldSpec(1, "key", f.map_key),
                    FieldSpec(2, "value", f.map_value, message=f.map_value_message),
                ],
            )
            for k, mv in v.items():
                payload = encode_message(entry, {"key": k, "value": mv})
                _write_varint((f.number << 3) | 2, out)
                _write_varint(len(payload), out)
                out.extend(payload)
        elif f.repeated:
            for item in v:
                emit(f, item)
        else:
            emit(f, v)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def decode_protobuf_column(
    df: DataFrame, bin_col: Column | str, spec: MessageSpec,
    out_col: str = "doc_json",
) -> DataFrame:
    """binary column of wire-encoded messages -> flattened-JSON string column
    (Arrow-batched kernel). Parse with an explicit schema via
    operators/transforms.parse_json_docs, mirroring the S4 JSON source."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col

    @pandas_udf(T.StringType())
    def decode(bins: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else json.dumps(decode_flat(spec, bytes(b)))
                for b in bins
            ]
        )

    return df.withColumn(out_col, decode(c))


def encode_protobuf_column(
    df: DataFrame, spec: MessageSpec, value_cols: dict[str, Column],
    out_col: str = "proto_bytes",
) -> DataFrame:
    """Deterministic wire-encode of per-row values (fixture/round-trip side).
    ``value_cols`` maps TOP-LEVEL spec field names to Columns; nested values
    are passed as struct/map/array columns."""

    names = list(value_cols)

    @pandas_udf(T.BinaryType())
    def encode(*cols: pd.Series) -> pd.Series:
        import numpy as np

        def per_row(col):
            # struct args arrive as a pd.DataFrame (one sub-column per field)
            if isinstance(col, pd.DataFrame):
                return col.to_dict("records")
            return list(col)

        rows = []
        for vals in zip(*[per_row(c) for c in cols]):
            d = {}
            for name, v in zip(names, vals):
                if v is None:
                    continue
                if isinstance(v, np.ndarray):
                    v = v.tolist()
                elif hasattr(v, "item") and not isinstance(v, (dict, list)):
                    v = v.item()  # numpy scalar -> python
                d[name] = v
            rows.append(encode_message(spec, d))
        return pd.Series(rows)

    return df.withColumn(out_col, encode(*[value_cols[n] for n in names]))
