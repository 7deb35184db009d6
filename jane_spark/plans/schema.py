"""Plugin meta-dict → Spark schema builder (SURVEY.md §1.3).

jane's plugins declare their index payload as a dict
``{field: "str"|"int"|"float"|"bool"|"UTCDateTime"}`` that drives both
REST query casting and (here) schema-on-write Parquet layout
[ref: src/jane/documents/plugins.py — IndexerPluginPoint.meta, conf=H;
SURVEY.md §0 caveat]. Where jane stores free-form jsonb + a GIN index,
the Spark-native answer is a typed columnar table: Parquet min/max
stats + dictionary + predicate pushdown replace the GIN index, and an
``extra map<string,string>`` column keeps undeclared fields.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One instrument-response stage (FDSN StationXML 1.1 <Stage>): gain +
# units always; PolesZeros/Coefficients stages carry their transfer
# function as compact string payloads ("re:im;re:im" complex lists) —
# typed enough for columnar pruning, cheap enough to carry on every
# channel-epoch row at 100 TB (stages are a small bounded array).
RESPONSE_STAGE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("number", T.IntegerType(), nullable=True),
            T.StructField("stage_type", T.StringType(), nullable=True),
            T.StructField("gain", T.DoubleType(), nullable=True),
            T.StructField("gain_frequency", T.DoubleType(), nullable=True),
            T.StructField("input_units", T.StringType(), nullable=True),
            T.StructField("output_units", T.StringType(), nullable=True),
            T.StructField("poles", T.StringType(), nullable=True),
            T.StructField("zeros", T.StringType(), nullable=True),
        ]
    )
)

_TYPE_MAP = {
    "str": T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "UTCDateTime": T.TimestampNTZType(),
    "response_stages": RESPONSE_STAGE_TYPE,
}


def meta_to_schema(
    meta: dict[str, str],
    include_extra: bool = True,
    include_geometry: bool = True,
) -> T.StructType:
    """Typed StructType from a plugin meta dict. ``geometry`` becomes
    (longitude, latitude) doubles if not already declared — jane only
    ever needs point-in-box / point-in-radius (SURVEY.md §1.3)."""
    fields = [
        T.StructField(name, _TYPE_MAP[typ], nullable=True)
        for name, typ in meta.items()
    ]
    names = set(meta)
    if include_geometry:
        for g in ("longitude", "latitude"):
            if g not in names:
                fields.append(T.StructField(g, T.DoubleType(), nullable=True))
    if include_extra:
        fields.append(
            T.StructField(
                "extra", T.MapType(T.StringType(), T.StringType()), nullable=True
            )
        )
    return T.StructType(fields)


# The two shipped document types (SURVEY.md §1.1 representative schemas)

STATIONXML_META: dict[str, str] = {
    # one index row per channel epoch
    "network": "str",
    "station": "str",
    "location": "str",
    "channel": "str",
    "latitude": "float",
    "longitude": "float",
    "elevation_in_m": "float",
    "depth_in_m": "float",
    "start_date": "UTCDateTime",
    "end_date": "UTCDateTime",  # NULL = open epoch
    "sample_rate": "float",
    "sensor_type": "str",
    "total_sensitivity": "float",
    "sensitivity_frequency": "float",
    "units_after_sensitivity": "str",
    # full per-stage response detail (level=response); NULL when the
    # source document carried only total sensitivity
    "response_stages": "response_stages",
    # jane's restricted-data flag (B12): TRUE = visible only to users
    # whose ACL grants this SEED id; NULL/FALSE = open
    "restricted": "bool",
}

QUAKEML_META: dict[str, str] = {
    # one index row per event
    "quakeml_id": "str",
    "latitude": "float",
    "longitude": "float",
    "depth_in_m": "float",
    "origin_time": "UTCDateTime",
    "magnitude": "float",
    "magnitude_type": "str",
    "agency": "str",
    "author": "str",
    "public": "bool",
    "evaluation_mode": "str",
    "event_type": "str",
    "has_focal_mechanism": "bool",
    "has_moment_tensor": "bool",
    # preferred focal-mechanism nodal plane 1 (degrees); NULL when the
    # source document carries no mechanism (or only a moment tensor
    # without derived planes)
    "fm_strike": "float",
    "fm_dip": "float",
    "fm_rake": "float",
    # last catalog modification time (FDSN event `updatedafter`)
    "updated": "UTCDateTime",
}

TRACE_META: dict[str, str] = {
    # ContinuousTrace analogue (waveform index row)
    "network": "str",
    "station": "str",
    "location": "str",
    "channel": "str",
    "starttime": "UTCDateTime",
    "endtime": "UTCDateTime",
    "sampling_rate": "float",
    "npts": "int",
    "duration": "float",
    "quality": "str",
    "file_id": "int",
    "pos": "int",
    "restricted": "bool",  # B12: see STATIONXML_META.restricted
}
