"""Timezone-independent timestamp arithmetic (round-6 hardening).

The engine stores all wall-clock times as ``timestamp_ntz`` interpreted
as UTC (the seismological convention — SEED/StationXML/QuakeML times
are UTC). Converting an NTZ value to epoch microseconds via
``unix_micros(col.cast('timestamp'))`` silently applies
``spark.sql.session.timeZone``: in a DST-observing session zone the
mapping is shifted AND non-linear, so absolute offsets are wrong by the
zone offset and durations spanning a DST transition are wrong by up to
an hour (the availability-spans bug class, ADVICE r5). ``ntz_epoch_us``
computes the same number through interval arithmetic — two NTZ values
subtracted give a day-time interval, whose decimal cast is exact
seconds-with-µs — touching no timezone machinery at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "1970-01-01 00:00:00"


def ntz_epoch_us(c: Column) -> Column:
    """Epoch microseconds of a ``timestamp_ntz`` read as UTC — exact to
    the microsecond and independent of ``spark.sql.session.timeZone``.
    Plain ``timestamp`` inputs are first cast to NTZ (session-zone wall
    clock), matching the engine's UTC-session posture."""
    iv = c.cast("timestamp_ntz") - F.lit(_EPOCH).cast("timestamp_ntz")
    return (iv.cast("decimal(30,6)") * 1_000_000).cast("long")
