"""Spark 4 Python Data Source for waveform files (SURVEY.md §2.1 A1).

``spark.read.format("waveform").load(dir)`` — the long-term home for
jane's waveform-file scan (the `binaryFile`+mapInPandas path in
``sources/ingest.py`` is the interim). One InputPartition per file:
Spark schedules files across executors; each partition format-sniffs
its file (JSW1, SAC, MiniSEED v2/v3, GSE2 — seismic_formats.read_auto)
and parses it into per-trace index rows — exactly the distribution
jane's single-host crawler lacks. Column pruning of the heavyweight
``samples`` array is honored at parse time (the only expensive field).

Register once per session::

    from jane_spark.sources.waveform_datasource import register
    register(spark)
    df = spark.read.format("waveform").load("/data/waveforms")
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("network", StringType()),
        StructField("station", StringType()),
        StructField("location", StringType()),
        StructField("channel", StringType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("sampling_rate", DoubleType()),
        StructField("npts", IntegerType()),
        StructField("quality", StringType()),
        StructField("pos", LongType()),
        # double: integer codecs (JSW1/Steim/CM6) widen losslessly;
        # SAC / MiniSEED float encodings need the float range
        StructField("samples", ArrayType(DoubleType())),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WaveformReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("waveform source requires a path")
        self._want_samples = any(f.name == "samples" for f in schema.fields)

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if not f.startswith((".", "_"))
            )
        else:
            files = [self._path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        from jane_spark.sources.seismic_formats import read_auto

        cols = [f.name for f in self._schema.fields]
        with open(partition.path, "rb") as fh:
            data = fh.read()
        for rec in read_auto(data):
            rec["path"] = partition.path
            if self._want_samples:
                rec["samples"] = [float(s) for s in rec["samples"]]
            else:
                rec["samples"] = None  # pruned: skip shipping the array
            yield tuple(rec[c] for c in cols)


class WaveformDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "waveform"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> WaveformReader:
        return WaveformReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(WaveformDataSource)
