"""fdsnws-dataselect cut phase (SURVEY.md §3.2 stages 3–4, row A7).

``dataselect_query`` (services/fdsnws.py) resolves WHICH (file, pos)
regions a request touches; this module does the byte work: read each
matched record at its stored offset (format-sniffed per file — JSW1,
SAC, MiniSEED v2/v3, GSE2 all cut through the same path), trim samples
to the cut window, and optionally re-encode the trimmed trace — the
MiniSEED-response assembly of the reference, in the source format by
default or any writable format via ``out_format``.

Distribution: cut rows are repartitioned by file path, so each task
opens a file once and seeks through its matched records — the
single-web-worker file loop of the reference becomes a parallel scan
of exactly the matched byte regions (never whole directories).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jane_spark.functions.time import ntz_epoch_us

CUT_SCHEMA = (
    "path string, network string, station string, location string, "
    "channel string, start_us long, npts int, sampling_rate double, "
    "quality string, samples array<double>, payload binary"
)


def cut_waveforms(
    cut_rows: DataFrame, reencode: bool = False, out_format: str = "same"
) -> DataFrame:
    """Execute the cut plan: one output row per matched segment,
    trimmed to [cut_start, cut_end].

    ``cut_rows`` must carry ``path``, ``pos``, ``cut_start``,
    ``cut_end`` (the dataselect_query output joined to file paths).
    Sample trim follows the reference's trim semantics: keep samples
    whose timestamp lies inside the closed window; the emitted
    ``start_us`` is the first kept sample's time. ``reencode=True``
    adds the serialized record bytes (the A7 byte-stream response);
    ``out_format`` picks the response codec — ``"same"`` re-encodes in
    each source file's own format, or name one of ``jsw1``/``mseed``/
    ``mseed3``/``sac``/``gse2`` (jane serves MiniSEED).
    """
    plan = cut_rows.select(
        "path",
        F.col("pos").cast("long").alias("pos"),
        # tz-free: cut bounds are UTC wall times compared against the
        # files' true UTC epoch offsets — a session-timezone cast would
        # shift every cut by the zone offset (functions/time.py)
        ntz_epoch_us(F.col("cut_start")).alias("cut_start_us"),
        ntz_epoch_us(F.col("cut_end")).alias("cut_end_us"),
    ).repartition("path")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from jane_spark.sources.seismic_formats import (
            read_record_at_auto,
            write_trace,
        )

        cache: dict[str, bytes] = {}
        for pdf in batches:
            out: list[dict] = []
            for path, pos, cs, ce in zip(
                pdf["path"], pdf["pos"], pdf["cut_start_us"], pdf["cut_end_us"]
            ):
                if path not in cache:
                    # binaryFile-scanned indexes store file: URIs; the
                    # JSW1 data source stores bare paths — accept both
                    local = path
                    if local.startswith("file:"):
                        local = local[5:]
                        while local.startswith("//"):
                            local = local[1:]
                    with open(local, "rb") as fh:
                        cache[path] = fh.read()
                rec, src_fmt = read_record_at_auto(cache[path], int(pos))
                rate, start = rec["sampling_rate"], rec["start_us"]
                step = 1_000_000.0 / rate
                # first/last sample indices inside the closed window
                i0 = 0 if cs <= start else math.ceil((cs - start) / step)
                i1 = rec["npts"] - 1
                if ce < rec["end_us"]:
                    i1 = min(i1, int((ce - start) // step))
                if i1 < i0:
                    continue  # window misses every sample
                samples = rec["samples"][i0 : i1 + 1]
                new_start = start + int(i0 * step)
                payload = None
                if reencode:
                    payload = write_trace(
                        src_fmt if out_format == "same" else out_format,
                        rec["network"], rec["station"], rec["location"],
                        rec["channel"], new_start, rate, samples,
                        rec["quality"],
                    )
                out.append(
                    {
                        "path": path,
                        "network": rec["network"],
                        "station": rec["station"],
                        "location": rec["location"],
                        "channel": rec["channel"],
                        "start_us": new_start,
                        "npts": len(samples),
                        "sampling_rate": rate,
                        "quality": rec["quality"],
                        "samples": samples,
                        "payload": payload,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return plan.mapInPandas(run, CUT_SCHEMA)


def dataselect_response(
    index: DataFrame,
    params: dict[str, str],
    acl: DataFrame | None = None,
    out_format: str = "mseed",
):
    """Full fdsnws-dataselect response: resolve the request against the
    trace index (``dataselect_query`` — SEED wildcards, window overlap,
    quality, longestonly, ACL), cut the matched byte regions, and yield
    the re-encoded records in SEED-id + time order as a stream of bytes
    chunks — the concatenated-MiniSEED HTTP body jane serves. Same
    bounded-driver contract as the XML document assembly: records are
    fetched via ``toLocalIterator()``, one partition at a time."""
    from jane_spark.services.fdsnws import dataselect_query

    plan = dataselect_query(index, params, acl=acl)
    cut = cut_waveforms(plan, reencode=True, out_format=out_format)
    ordered = cut.select(
        "network", "station", "location", "channel", "start_us", "payload"
    ).orderBy("network", "station", "location", "channel", "start_us")
    for row in ordered.toLocalIterator():
        yield bytes(row["payload"])


def trace_previews(
    traces: DataFrame,
    seconds_per_block: float = 60.0,
    samples_col: str = "samples",
    rate_col: str = "sampling_rate",
    start_col: str = "start_us",
) -> DataFrame:
    """D7 on real traces: per-block min/max preview rows, one per
    ``seconds_per_block`` window of each trace — the reference's
    ``preview_trace`` arrays, computed with array builtins per record
    (no per-sample explode; the preview is ~1/block the input size
    before any shuffle). For a fixed-rate corpus the column-API variant
    is functions.arrays.block_minmax."""
    out = traces.withColumn(
        "__block", (F.col(rate_col) * F.lit(seconds_per_block)).cast("int")
    )
    # block sizes are per-row; build previews with a SQL expression so
    # the slice length can reference the row's own __block column
    prev = F.expr(
        f"""
        transform(
            sequence(0, cast(ceil(size({samples_col}) / __block) as int) - 1),
            i -> struct(
                array_min(slice({samples_col}, i * __block + 1, __block)) AS pmin,
                array_max(slice({samples_col}, i * __block + 1, __block)) AS pmax,
                i AS block_no))
        """
    )
    return (
        out.withColumn("__prev", prev)
        .select(
            "network", "station", "location", "channel",
            F.col(start_col),
            F.col(rate_col),
            F.explode("__prev").alias("p"),
        )
        .select(
            "network", "station", "location", "channel",
            (
                F.col(start_col)
                + (F.col("p.block_no") * F.lit(seconds_per_block * 1_000_000)).cast("long")
            ).alias("block_start_us"),
            F.col("p.pmin").alias("pmin"),
            F.col("p.pmax").alias("pmax"),
        )
    )
