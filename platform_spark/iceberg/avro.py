"""Minimal Apache Avro Object Container File writer/reader (pure Python).

Implements the subset of the Avro 1.11 spec that Apache Iceberg manifest
and manifest-list files use — records, nullable unions (["null", T]),
int/long (zigzag varint), string/bytes, boolean, arrays, and maps — plus
the container framing (magic ``Obj\\x01``, file-metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker, data blocks with
``null`` or ``deflate`` codec).

The container lacks an Avro runtime (no ``avro``/``fastavro`` packages),
so this module is what lets the Iceberg table layer (table.py) write
manifests a real Iceberg runtime can read and read back its own commits.
The encoding is schema-driven and generic — nothing here is
Iceberg-specific; the Iceberg schemas live in table.py.

Spec: https://avro.apache.org/docs/1.11.1/specification/ (binary encoding
§ "Binary Encoding", container files § "Object Container Files").
Reference parity: the Go sink commits through iceberg-go, which produces
exactly these container files (iceberg-processor/internal/sink/
iceberg.go:146-204); byte-level behaviors (zigzag longs, block framing,
raw-deflate codec) follow the public spec, not that implementation.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# -- binary primitives (spec: Binary Encoding) ------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("avro: truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    if n < 0:
        raise ValueError("avro: negative bytes length")
    out = buf.read(n)
    if len(out) != n:
        raise ValueError("avro: truncated bytes")
    return out


# -- schema-driven value encoding -------------------------------------------


def _branch_index(schema: list, value) -> int:
    """Union branch selection for the shapes Iceberg uses: a null branch
    plus exactly one concrete branch."""
    names = [s if isinstance(s, str) else s.get("type") for s in schema]
    if value is None:
        if "null" not in names:
            raise ValueError(f"avro: None for non-nullable union {names}")
        return names.index("null")
    for i, n in enumerate(names):
        if n != "null":
            return i
    raise ValueError(f"avro: no concrete branch in union {names}")


def encode(buf: io.BytesIO, schema, value) -> None:
    """Encode ``value`` per ``schema`` (parsed Avro JSON) into ``buf``."""
    if isinstance(schema, list):  # union
        idx = _branch_index(schema, value)
        write_long(buf, idx)
        encode(buf, schema[idx], value)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "fixed":
        size = schema["size"]
        if len(value) != size:
            raise ValueError(f"avro: fixed size {len(value)} != {size}")
        buf.write(bytes(value))
    elif t == "record":
        for field in schema["fields"]:
            try:
                fv = value.get(field["name"], field.get("default"))
                encode(buf, field["type"], fv)
            except ValueError as e:
                raise ValueError(f"{schema['name']}.{field['name']}: {e}") from e
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, str(k).encode("utf-8"))
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


def decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):  # union
        idx = read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} out of range")
        return decode(buf, schema[idx])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return read_bytes(buf)
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
    raise ValueError(f"avro: unsupported type {t!r}")


# -- container files --------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}
# deterministic sync marker: derived from path so re-writing the same
# manifest is byte-identical (metadata commits hash-compare in tests)
_SYNC_SEED = b"platform-spark-iceberg-avro-sync"


def _sync_for(name: str) -> bytes:
    import hashlib

    return hashlib.sha256(_SYNC_SEED + name.encode("utf-8")).digest()[:16]


def write_container(
    path: str,
    schema: dict,
    records: list,
    metadata: dict | None = None,
    codec: str = "deflate",
) -> int:
    """Write an Avro Object Container File; returns bytes written."""
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    encode(buf, _META_SCHEMA, meta)
    sync = _sync_for(os.path.basename(path))
    buf.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            encode(block, schema, rec)
        payload = block.getvalue()
        if codec == "deflate":  # raw RFC1951, no zlib wrapper (spec)
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = comp.compress(payload) + comp.flush()
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    data = buf.getvalue()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_container(path: str) -> tuple[dict, dict, list]:
    """Read an Avro container file → (schema, file_metadata, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    meta = decode(buf, _META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list = []
    while True:
        # distinguish clean EOF (no bytes at a block boundary) from a
        # mid-varint truncation: swallowing the latter would silently
        # return partial entries and a scan would silently drop data files
        first = buf.read(1)
        if first == b"":
            break  # clean EOF
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)  # truncated varint raises here
        size = read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError(f"avro: truncated block in {path}")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode(block, schema))
        if buf.read(16) != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, meta, records
