"""File-ingest sources (SURVEY.md §2.1 A1–A3, §2.10 J1, §3.3).

jane's ingest: crawl directories, detect format, parse each file with
ObsPy into per-trace/channel/event index rows [ref:
src/jane/waveforms/process_waveforms.py — process_file;
src/jane/stationxml/plugin.py + quakeml/plugin.py — index(), conf=H;
SURVEY.md §0 caveat]. ObsPy is not available in this environment
(SURVEY.md §7.4 risk 6), so the parser interface is pluggable: the
Spark-side plumbing (binaryFile scan → Arrow-batched parse →
exploded index rows) is real and tested; format parsers are
deterministic synthetic stand-ins registered in PARSERS.

At scale: ``binaryFile`` scans parallelize per file; parsing runs in
executors via mapInPandas (Arrow batches, no per-row Python overhead);
the delta scan (A9) anti-joins the current listing against the indexed
``files`` table so only new/changed files are parsed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# parser registry: format name -> bytes -> list[dict] of index rows.
PARSERS: dict[str, Callable[[bytes], list[dict]]] = {}


def register_parser(fmt: str):
    def deco(fn):
        PARSERS[fmt] = fn
        return fn

    return deco


@register_parser("bytes_stats")
def _bytes_stats(data: bytes) -> list[dict]:
    """Deterministic synthetic parser: per-4KiB-block byte statistics —
    the stand-in for a waveform parser emitting per-trace records."""
    rows = []
    for i in range(0, max(len(data), 1), 4096):
        block = data[i : i + 4096]
        rows.append(
            {
                "block_no": i // 4096,
                "n_bytes": len(block),
                "checksum": sum(block) % (2**31),
            }
        )
    return rows


INDEX_SCHEMA = "path string, block_no int, n_bytes long, checksum long"


def scan_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """A1: binary-file scan. Column pruning matters: select metadata
    columns only unless content is needed (avoids reading payloads)."""
    return spark.read.format("binaryFile").load(path_glob)


def parse_files(binary_df: DataFrame, fmt: str = "bytes_stats") -> DataFrame:
    """J1: per-file parse via mapInPandas — one file → many index rows."""
    parser = PARSERS[fmt]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, data in zip(pdf["path"], pdf["content"]):
                for row in parser(bytes(data)):
                    out.append({"path": path, **row})
            yield pd.DataFrame(
                out, columns=["path", "block_no", "n_bytes", "checksum"]
            )

    return binary_df.select("path", "content").mapInPandas(run, INDEX_SCHEMA)


def delta_files(current_listing: DataFrame, indexed_files: DataFrame) -> DataFrame:
    """A9: files needing (re)indexing — new paths or changed mtime/size.
    Left anti join on (path, mtime, size): one shuffle, no full rescan."""
    return current_listing.join(
        indexed_files.select("path", "mtime", "size"),
        on=["path", "mtime", "size"],
        how="left_anti",
    )


def deleted_files(current_listing: DataFrame, indexed_files: DataFrame) -> DataFrame:
    """A9/C6: indexed paths no longer on disk (indices to drop)."""
    return indexed_files.select("path").subtract(current_listing.select("path"))


WAVEFORM_INDEX_SCHEMA = (
    "path string, network string, station string, location string, "
    "channel string, start_us long, end_us long, sampling_rate double, "
    "npts int, quality string, pos long"
)


def parse_waveform_files(binary_df: DataFrame) -> DataFrame:
    """J1 on the real codecs: binaryFile rows → per-trace index rows.
    Format is sniffed per file (JSW1 magic / SAC NVHDR / MiniSEED ASCII
    header — sources.seismic_formats.read_auto), so one ingest stream
    handles a mixed archive, matching jane's ObsPy-autodetect ingest.
    (The mapInPandas twin of the ``waveform`` data source — same
    codecs, same output shape minus samples.)"""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jane_spark.sources.seismic_formats import read_auto

        cols = [c.split(" ")[0] for c in WAVEFORM_INDEX_SCHEMA.split(", ")]
        for pdf in batches:
            out = []
            for path, data in zip(pdf["path"], pdf["content"]):
                for rec in read_auto(bytes(data)):
                    rec["path"] = path
                    out.append({c: rec[c] for c in cols})
            yield pd.DataFrame(out, columns=cols)

    return binary_df.select("path", "content").mapInPandas(
        run, WAVEFORM_INDEX_SCHEMA
    )
