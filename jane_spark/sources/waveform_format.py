"""Synthetic waveform file format ("JSW1") + codec.

jane indexes real seismic formats (MiniSEED/SAC/…) via ObsPy
[ref: src/jane/waveforms/process_waveforms.py — process_file, conf=H;
SURVEY.md §0 caveat]. ObsPy is unavailable in this environment
(SURVEY.md §7.4 risk 6), so the dataflow is proven on a deterministic
stand-in format with the same shape as MiniSEED's fixed records:

    file  := record*
    record:= magic "JSW1" | net(2s) sta(5s) loc(2s) cha(3s)
             | start_us(int64) | rate_hz(float64) | npts(int32)
             | quality(1s) | samples(npts × int32)

Strings are ASCII, space-padded. One record is one continuous trace
segment — the unit of jane's ContinuousTrace index. The parser
interface is pluggable: a real MiniSEED codec drops in by replacing
``read_records``/``write_record`` (byte-in, dict-out contract).
"""

from __future__ import annotations

import struct
from typing import Iterator

MAGIC = b"JSW1"
_HEADER = struct.Struct(">4s2s5s2s3sqdic")  # big-endian


def write_record(
    network: str,
    station: str,
    location: str,
    channel: str,
    start_us: int,
    rate_hz: float,
    samples: list[int],
    quality: str = "D",
) -> bytes:
    head = _HEADER.pack(
        MAGIC,
        network.ljust(2)[:2].encode(),
        station.ljust(5)[:5].encode(),
        location.ljust(2)[:2].encode(),
        channel.ljust(3)[:3].encode(),
        start_us,
        rate_hz,
        len(samples),
        quality.encode()[:1],
    )
    return head + struct.pack(f">{len(samples)}i", *samples)


def read_record_at(data: bytes, off: int) -> tuple[dict, int]:
    """Parse the single record at byte offset ``off`` (the stored
    ``pos`` of an index row — dataselect reads only matched regions);
    returns (record, next_offset). Raises ValueError on a bad magic
    (validator hook — jane's XSD-reject analogue)."""
    if data[off : off + 4] != MAGIC:
        raise ValueError(f"bad magic at offset {off}")
    magic, net, sta, loc, cha, start_us, rate, npts, q = _HEADER.unpack_from(data, off)
    body = off + _HEADER.size
    samples = struct.unpack_from(f">{npts}i", data, body)
    end_us = start_us + int(npts / rate * 1_000_000) if rate > 0 else start_us
    return {
        "network": net.decode().strip(),
        "station": sta.decode().strip(),
        "location": loc.decode().strip(),
        "channel": cha.decode().strip(),
        "start_us": start_us,
        "end_us": end_us,
        "sampling_rate": rate,
        "npts": npts,
        "quality": q.decode(),
        "pos": off,
        "samples": list(samples),
    }, body + 4 * npts


def read_records(data: bytes) -> Iterator[dict]:
    """Parse every record in a file."""
    off = 0
    while off < len(data):
        rec, off = read_record_at(data, off)
        yield rec
