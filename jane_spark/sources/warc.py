"""WARC web-archive source (ISO 28500 — the CommonCrawl container).

Web-scale training corpora start life as WARC: every crawler
(CommonCrawl, Heritrix, wget) emits it, and the first stage of every
public web-corpus pipeline (C4, CCNet, RefinedWeb) is "read WARC,
keep the response records, extract the HTTP payload". This module is
that stage, Spark-shaped:

- ``parse_warc`` — pure-bytes record parser (WARC/1.0 and 1.1,
  CRLF-framed headers, Content-Length block framing, per-record-gzip
  member support via stdlib zlib — the standard ``.warc.gz`` layout
  where each record is an independent gzip member so readers can seek);
- ``encode_warc`` — writer twin (uncompressed or member-gzip), so
  round-trip tests and fixtures need zero external files;
- ``read_warc`` — the distributed source: ``binaryFile`` scan (one
  task per archive, the same shape as the WebDataset reader) →
  Arrow-batched ``mapInPandas`` parse → one row per record with typed
  columns + each record's byte offset/length in its archive (the CDX
  index fields — at 100 TB you materialize THIS table once and serve
  random access by byte range instead of re-scanning archives);
- ``http_payload`` — row-local split of a response record's block into
  HTTP status + body (the bytes the HTML pipeline consumes).

Scale shape: archives are self-contained, so the scan parallelizes
per file with zero shuffles; the parse is a linear pass per archive.
CommonCrawl segments are ~1 GB gzip members — one task's memory holds
one archive, same budget contract as the WebDataset shard writer.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession

#: Output schema of the record table (CDX fields last).
WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content binary, "
    "content_length long, offset long, length long"
)

_CRLF = b"\r\n"


def _parse_one(data: bytes, off: int) -> tuple[dict, bytes, int]:
    """Parse one uncompressed record at ``off``; returns
    (headers, block, next_offset). Raises ValueError on framing
    errors — a torn archive must fail loudly, not yield shifted
    garbage records."""
    if not data.startswith(b"WARC/", off):
        raise ValueError(f"expected WARC version line at offset {off}")
    head_end = data.find(_CRLF + _CRLF, off)
    if head_end < 0:
        raise ValueError("unterminated WARC header block")
    lines = data[off:head_end].split(_CRLF)
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        # continuation lines (space/tab) fold into the previous value
        if ln[:1] in (b" ", b"\t") and headers:
            headers[last] += " " + ln.strip().decode("utf-8", "replace")  # noqa: F821
            continue
        name, _, value = ln.partition(b":")
        last = name.decode("ascii", "replace").strip().lower()
        headers[last] = value.decode("utf-8", "replace").strip()
    try:
        n = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("missing/invalid Content-Length") from None
    block_start = head_end + 4
    block = data[block_start : block_start + n]
    if len(block) != n:
        raise ValueError("truncated WARC block")
    tail = block_start + n
    if data[tail : tail + 4] != _CRLF + _CRLF:
        raise ValueError("missing record trailer CRLFCRLF")
    return headers, block, tail + 4


def _gzip_members(data: bytes):
    """Yield (member_bytes_decompressed, offset, compressed_length) for
    each gzip member of a concatenated-member archive. Corrupt/
    truncated members raise ValueError like every other framing error
    (zlib.error would slip past callers' error contracts)."""
    off = 0
    while off < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data[off:])
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member at {off}: {exc}") from None
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {off}")
        consumed = len(data) - off - len(d.unused_data)
        yield out, off, consumed
        off += consumed


def parse_warc(data: bytes) -> list[dict]:
    """All records of one archive (gzip-member or plain), each a dict
    with the WARC_SCHEMA fields. ``offset``/``length`` are the
    record's byte range IN THE ARCHIVE AS STORED (the compressed
    member for .warc.gz — exactly what a CDX byte-range fetch needs)."""
    out = []
    if data[:2] == b"\x1f\x8b":
        spans = list(_gzip_members(data))
    else:
        spans = None
    if spans is not None:
        for raw, m_off, m_len in spans:
            off = 0
            while off < len(raw):
                headers, block, nxt = _parse_one(raw, off)
                # per-member offsets: the member's own range when it
                # holds one record (the standard layout), else the
                # member range for every record it holds
                out.append(_row(headers, block, m_off, m_len))
                off = nxt
    else:
        off = 0
        while off < len(data):
            headers, block, nxt = _parse_one(data, off)
            out.append(_row(headers, block, off, nxt - off))
            off = nxt
    return out


def _row(headers: dict, block: bytes, off: int, length: int) -> dict:
    return {
        "record_id": headers.get("warc-record-id", ""),
        "warc_type": headers.get("warc-type", ""),
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date", ""),
        "content_type": headers.get("content-type"),
        "content": block,
        "content_length": len(block),
        "offset": off,
        "length": length,
    }


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Writer twin: each record needs ``warc_type`` + ``content``
    (bytes or str); ``record_id``/``target_uri``/``warc_date``/
    ``content_type`` are optional. ``gzip_members=True`` writes the
    standard .warc.gz layout (one independent gzip member per record,
    mtime zeroed → byte-identical re-runs, the WebDataset precedent)."""
    parts = []
    for i, r in enumerate(records):
        body = r["content"]
        body = body.encode("utf-8") if isinstance(body, str) else bytes(body)
        headers = [
            ("WARC-Type", r["warc_type"]),
            ("WARC-Record-ID", r.get("record_id") or f"<urn:uuid:rec-{i}>"),
            ("WARC-Date", r.get("warc_date") or "2024-01-01T00:00:00Z"),
        ]
        if r.get("target_uri"):
            headers.append(("WARC-Target-URI", r["target_uri"]))
        if r.get("content_type"):
            headers.append(("Content-Type", r["content_type"]))
        headers.append(("Content-Length", str(len(body))))
        rec = (
            b"WARC/1.0\r\n"
            + b"".join(f"{k}: {v}\r\n".encode() for k, v in headers)
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
            # mtime lives in the gzip header zlib writes; the wbits|16
            # path emits mtime=0 — determinism for free
            rec = co.compress(rec) + co.flush()
        parts.append(rec)
    return b"".join(parts)


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """Distributed WARC source: one row per record across every
    matching archive under ``path`` (binaryFile: one task per archive;
    ``glob`` keeps manifests/_SUCCESS out, the read_webdataset
    precedent). Adds ``archive`` (source file path) ahead of the
    WARC_SCHEMA columns — (archive, offset, length) IS the CDX index."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, payload in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(payload)):
                    rows.append({"archive": p, **rec})
            yield pd.DataFrame(
                rows,
                columns=["archive"] + [c.split(" ")[0] for c in WARC_SCHEMA.split(", ")],
            )

    binary = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )
    return binary.select("path", "content").mapInPandas(
        parse, "archive string, " + WARC_SCHEMA
    )


def http_payload(content: bytes) -> tuple[int | None, bytes]:
    """Split a response record's block into (HTTP status, body bytes).
    Non-HTTP blocks (no status line / no header terminator) come back
    as (None, whole block) — total, like every decoder here."""
    if not content.startswith(b"HTTP/"):
        return None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None, content
    status_line = content[: content.find(b"\r\n")].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, content
    return status, content[sep + 4 :]


def fetch_warc_ranges(cdx: DataFrame) -> DataFrame:
    """The random-access half of the CDX story: given rows carrying
    ``(archive, offset, length)`` — exactly what ``read_warc`` emits —
    re-fetch ONLY those byte ranges and parse the records they hold.
    At 100 TB this is how a pipeline revisits 0.1% of a crawl (the
    docs a classifier flagged, the URLs a dedup pass kept) without
    re-scanning archives: the CDX table prunes, each task seeks.

    Executor-side ``seek``+``read`` per row over shared storage (the
    same locality contract as every file source here); input rows that
    fail (missing file, torn range) surface as records with NULL
    record_id and the error in ``target_uri`` — total, like the codec
    registry. No shuffle: fetches run where the CDX rows already are."""
    import pandas as pd

    cols = ["archive"] + [c.split(" ")[0] for c in WARC_SCHEMA.split(", ")]

    def fetch(batches):
        for pdf in batches:
            rows = []
            for archive, off, length in zip(
                pdf["archive"], pdf["offset"], pdf["length"]
            ):
                path = archive
                if path.startswith("file:"):
                    path = path[5:]
                    while path.startswith("//"):
                        path = path[1:]
                try:
                    with open(path, "rb") as fh:
                        fh.seek(int(off))
                        data = fh.read(int(length))
                    for rec in parse_warc(data):
                        rows.append(
                            {
                                "archive": archive,
                                **rec,
                                # range-relative offsets rebase to the
                                # archive so a re-fetch of a re-fetch
                                # still addresses the same bytes
                                "offset": int(off) + rec["offset"],
                            }
                        )
                except (OSError, ValueError) as exc:
                    rows.append(
                        {
                            "archive": archive,
                            "record_id": None,
                            "warc_type": "error",
                            "target_uri": f"{type(exc).__name__}: {exc}",
                            "warc_date": "",
                            "content_type": None,
                            "content": None,
                            "content_length": 0,
                            "offset": int(off),
                            "length": int(length),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return cdx.select("archive", "offset", "length").mapInPandas(
        fetch, "archive string, " + WARC_SCHEMA
    )
