"""Avro Object Container File source with per-block QUARANTINE
(round 15, A17 — VERDICT r14 next-step #8).

The fourth quarantine container after JSONL/CSV/XML (q_a11/a14/a15)
and the Kafka-lake interchange format: this PySpark build ships no
``spark-avro`` datasource jar and no python ``avro``/``fastavro``
package (verified — the a15 lesson), so the reader is a FROM-SPEC
implementation of the public Apache Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/ — "Object
Container Files" + the binary encoding rules), the same discipline as
the WARC (ISO 28500) and media-codec parsers in this package. jane's
analogue is its upload path rejecting invalid documents into an error
state [ref: src/jane/documents — validation on PUT, conf=M; SURVEY.md
§0 caveat].

Spec subset, deliberately bounded (unsupported constructs quarantine
the FILE, loudly, never silently misread):

- container: magic ``Obj\\x01``, metadata map (``avro.schema`` JSON +
  ``avro.codec``), 16-byte sync marker, then blocks of
  ``(long count, long size, data, sync)``;
- codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951 — the two the
  spec requires every implementation to support);
- schemas: one top-level ``record`` whose fields are the primitives
  ``boolean int long float double string bytes`` or the nullable
  2-branch union ``["null", <primitive>]``.

Quarantine granularity is the BLOCK: records inside a block are
concatenated with no per-record framing, so a decode error poisons
every later byte of that block — but the sync-delimited container
structure survives, so the reader quarantines the block (declared
count + raw bytes intact for re-processing) and continues at the next
block. Never silently dropping, never failing the batch — the 100 TB
posture shared with the other quarantine containers.

At scale: ``binaryFile`` scans parallelize per file; parsing runs
executor-side via mapInPandas (Arrow batches); one container = one
task's work, so a 10k-file lake reads as 10k independent tasks.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"Obj\x01"
_PRIMITIVES = {
    "boolean", "int", "long", "float", "double", "string", "bytes",
}

QUARANTINE_SCHEMA = (
    "path string, block_index int, n_declared long, raw binary, "
    "error string"
)


# ----------------------------------------------------------- encoding

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(buf: bytearray, typ, val) -> None:
    if isinstance(typ, list):  # ["null", T]
        if val is None:
            buf += _zigzag_encode(0)
            return
        buf += _zigzag_encode(1)
        _encode_value(buf, typ[1], val)
        return
    if typ == "null":
        return
    if typ == "boolean":
        buf.append(1 if val else 0)
    elif typ in ("int", "long"):
        buf += _zigzag_encode(int(val))
    elif typ == "float":
        buf += struct.pack("<f", float(val))
    elif typ == "double":
        buf += struct.pack("<d", float(val))
    elif typ == "string":
        raw = str(val).encode("utf-8")
        buf += _zigzag_encode(len(raw)) + raw
    elif typ == "bytes":
        raw = bytes(val)
        buf += _zigzag_encode(len(raw)) + raw
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def encode_block(records, fields) -> bytes:
    """Concatenated binary encoding of ``records`` (dicts) against
    ``fields`` = [(name, type), ...] — a container block's
    pre-compression data bytes."""
    buf = bytearray()
    for rec in records:
        for name, typ in fields:
            _encode_value(buf, typ, rec[name])
    return bytes(buf)


def write_avro_bytes(
    records,
    fields,
    name: str = "row",
    codec: str = "null",
    sync: bytes = b"jane-spark-sync!",
    records_per_block: int = 1000,
    raw_blocks=None,
) -> bytes:
    """An Avro Object Container File as bytes, from spec. ``fields`` =
    [(name, type)] with types from the supported subset. Pass
    ``raw_blocks`` = [(count, data_bytes), ...] to assemble
    pre-encoded (possibly deliberately corrupt — the q_a11 truncation
    recipe) blocks instead of encoding ``records``."""
    if len(sync) != 16:
        raise ValueError("sync marker must be exactly 16 bytes")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync
    if raw_blocks is None:
        raw_blocks = []
        recs = list(records)
        for i in range(0, len(recs), records_per_block):
            chunk = recs[i : i + records_per_block]
            raw_blocks.append((len(chunk), encode_block(chunk, fields)))
    for count, data in raw_blocks:
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += _zigzag_encode(count)
        out += _zigzag_encode(len(data))
        out += data
        out += sync
    return bytes(out)


# ----------------------------------------------------------- decoding

class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError(
                f"truncated: need {n} bytes at offset {self.i}, have "
                f"{len(self.b) - self.i}"
            )
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def long(self) -> int:
        z = 0
        shift = 0
        while True:
            if self.i >= len(self.b):
                raise ValueError("truncated varint")
            byte = self.b[self.i]
            self.i += 1
            z |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (z >> 1) ^ -(z & 1)

    @property
    def eof(self) -> bool:
        return self.i >= len(self.b)


def _decode_value(r: _Reader, typ):
    if isinstance(typ, list):
        idx = r.long()
        if idx < 0 or idx >= len(typ):
            raise ValueError(f"union index {idx} out of range")
        return _decode_value(r, typ[idx])
    if typ == "null":
        return None
    if typ == "boolean":
        return r.take(1) != b"\x00"
    if typ in ("int", "long"):
        return r.long()
    if typ == "float":
        return struct.unpack("<f", r.take(4))[0]
    if typ == "double":
        return struct.unpack("<d", r.take(8))[0]
    if typ == "string":
        n = r.long()
        if n < 0:
            raise ValueError(f"negative string length {n}")
        return r.take(n).decode("utf-8")
    if typ == "bytes":
        n = r.long()
        if n < 0:
            raise ValueError(f"negative bytes length {n}")
        return bytes(r.take(n))
    raise ValueError(f"unsupported avro type {typ!r}")


def _validate_schema(schema) -> list:
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("writer schema is not a record")
    fields = []
    for f in schema.get("fields", []):
        typ = f["type"]
        if isinstance(typ, list):
            ok = (
                len(typ) == 2
                and typ[0] == "null"
                and isinstance(typ[1], str)
                and typ[1] in _PRIMITIVES
            )
        else:
            ok = isinstance(typ, str) and typ in _PRIMITIVES
        if not ok:
            raise ValueError(
                f"unsupported field type {typ!r} for {f.get('name')!r} "
                "(supported: primitives and [\"null\", primitive])"
            )
        fields.append((f["name"], typ))
    return fields


def parse_avro_container(path: str, data: bytes):
    """Yield ``("good", record_dict)`` and
    ``("quarantine", (path, block_index, n_declared, raw, error))``
    tuples from one container's bytes. Header problems (bad magic,
    unparseable/unsupported schema, unknown codec) quarantine the
    whole file as block_index -1; a record decode error or sync
    mismatch quarantines that block and the reader continues at the
    next block boundary."""
    r = _Reader(data)
    try:
        if r.take(4) != _MAGIC:
            raise ValueError("bad magic (not an Avro container)")
        meta = {}
        while True:
            n = r.long()
            if n == 0:
                break
            for _ in range(abs(n)):
                k = r.take(r.long()).decode("utf-8")
                meta[k] = r.take(r.long())
            if n < 0:
                r.long()  # block-size variant: skip the byte size
        fields = _validate_schema(json.loads(meta["avro.schema"]))
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec {codec!r}")
        sync = r.take(16)
    except Exception as ex:  # header-level: quarantine the file
        yield "quarantine", (path, -1, 0, data, f"header: {ex}")
        return
    block_index = 0
    while not r.eof:
        try:
            count = r.long()
            size = r.long()
            if count < 0 or size < 0:
                raise ValueError(f"negative block header ({count}, {size})")
            payload = r.take(size)
            marker = r.take(16)
        except Exception as ex:
            # container framing broken: nothing after this point can
            # be trusted — quarantine the remainder and stop
            yield "quarantine", (
                path, block_index, 0, data[r.i :], f"framing: {ex}"
            )
            return
        try:
            if marker != sync:
                raise ValueError("sync marker mismatch")
            raw = (
                zlib.decompress(payload, -15)
                if codec == "deflate"
                else payload
            )
            br = _Reader(raw)
            recs = []
            for _ in range(count):
                recs.append(
                    {name: _decode_value(br, typ) for name, typ in fields}
                )
            if not br.eof:
                raise ValueError(
                    f"{len(raw) - br.i} trailing bytes after "
                    f"{count} records"
                )
        except Exception as ex:
            yield "quarantine", (path, block_index, count, payload, str(ex))
        else:
            for rec in recs:
                yield "good", rec
        block_index += 1


def read_avro_quarantine(
    spark: SparkSession, path_glob: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read Avro Object Container Files at ``path_glob``; return
    ``(good, quarantine)``. ``good`` carries the typed columns of the
    DDL ``schema`` (which must name a subset of the writer schema's
    fields); ``quarantine`` carries ``(path, block_index, n_declared,
    raw, error)`` per undecodable block (block_index -1 = whole-file
    header failure). The split mirrors read_jsonl_quarantine exactly
    so pipelines swap containers without changing error handling."""
    import pandas as pd
    from pyspark.sql.types import StructType

    out_fields = [f.name for f in StructType.fromDDL(schema).fields]
    binary = spark.read.format("binaryFile").load(path_glob)

    def parse_good(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for kind, item in parse_avro_container(path, bytes(content)):
                    if kind == "good":
                        rows.append([item.get(c) for c in out_fields])
            yield pd.DataFrame(rows, columns=out_fields)

    def parse_quarantine(batches):
        cols = ["path", "block_index", "n_declared", "raw", "error"]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for kind, item in parse_avro_container(path, bytes(content)):
                    if kind == "quarantine":
                        rows.append(item)
            yield pd.DataFrame(rows, columns=cols)

    good = binary.select("path", "content").mapInPandas(parse_good, schema)
    quarantine = binary.select("path", "content").mapInPandas(
        parse_quarantine, QUARANTINE_SCHEMA
    )
    return good, quarantine
