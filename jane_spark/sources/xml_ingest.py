"""XML document ingest: QuakeML/StationXML payloads → typed index rows
(SURVEY.md §2.1 A2/A3 — the one-file→many-rows expansion done for REAL,
not via a stand-in explode).

jane's plugins parse each uploaded document into per-entity index rows:
a QuakeML catalog yields one row per <event>, a StationXML inventory one
row per <Channel> epoch [ref: src/jane/quakeml/plugin.py — index();
src/jane/stationxml/plugin.py — index(), conf=H; SURVEY.md §0 caveat].

Spark translation: Arrow-batched ``mapInPandas`` — one pass over the
payload column, each document exploding to 0..n typed rows. XML parsing
has no JVM expression, so this is a legitimate Python stage (the
validation-gate precedent); it is row-local and zero-shuffle, scaling
with the scan. Compose with ``sources.validation`` first: these parsers
assume well-formed documents (a malformed one raises — the gate's job
is to keep it out of this lane).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

QUAKEML_EVENT_SCHEMA = (
    "quakeml_id string, origin_time timestamp_ntz, latitude double, "
    "longitude double, depth_in_m double, magnitude double, "
    "magnitude_type string, event_type string"
)

STATIONXML_CHANNEL_SCHEMA = (
    "network string, station string, latitude double, longitude double, "
    "elevation_in_m double, location string, channel string, "
    "start_date timestamp_ntz"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child(el, name):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _value(el, name):
    """<name><value>x</value></name> → x (QuakeML's value nesting)."""
    c = _child(el, name)
    if c is None:
        return None
    v = _child(c, "value")
    return (v if v is not None else c).text


def parse_quakeml_events(
    df: DataFrame, payload_col: str = "data"
) -> DataFrame:
    """QuakeML catalog documents → one row per <event> (A3): publicID,
    preferred-origin time/lat/lon/depth, magnitude value/type, event
    type. A catalog with n events yields n rows — the real
    one-file→many-rows expansion."""
    import xml.etree.ElementTree as ET

    def run(batches):
        for pdf in batches:
            rows = []
            for data in pdf[payload_col]:
                if isinstance(data, (bytes, bytearray)):
                    data = bytes(data).decode("utf-8")
                root = ET.fromstring(data)
                for ep in root:
                    if _local(ep.tag) != "eventParameters":
                        continue
                    for ev in ep:
                        if _local(ev.tag) != "event":
                            continue
                        origin = _child(ev, "origin")
                        mag = _child(ev, "magnitude")
                        t = _value(origin, "time") if origin is not None else None
                        rows.append(
                            {
                                "quakeml_id": ev.get("publicID"),
                                "origin_time": pd.Timestamp(t)
                                if t is not None
                                else None,
                                "latitude": _float(_value(origin, "latitude")),
                                "longitude": _float(_value(origin, "longitude")),
                                "depth_in_m": _float(_value(origin, "depth")),
                                "magnitude": _float(_value(mag, "mag"))
                                if mag is not None
                                else None,
                                "magnitude_type": _text(mag, "type"),
                                "event_type": _text(ev, "type"),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "quakeml_id", "origin_time", "latitude", "longitude",
                    "depth_in_m", "magnitude", "magnitude_type", "event_type",
                ],
            )

    return df.mapInPandas(run, QUAKEML_EVENT_SCHEMA)


def _float(v):
    return float(v) if v is not None else None


def _text(el, name):
    if el is None:
        return None
    c = _child(el, name)
    return c.text if c is not None else None


def parse_stationxml_channels(
    df: DataFrame, payload_col: str = "data"
) -> DataFrame:
    """FDSNStationXML inventory documents → one row per <Channel>
    epoch (A2): network/station codes, station coordinates, channel +
    location codes, epoch start. An inventory with n channels yields
    n rows."""
    import xml.etree.ElementTree as ET

    def run(batches):
        for pdf in batches:
            rows = []
            for data in pdf[payload_col]:
                if isinstance(data, (bytes, bytearray)):
                    data = bytes(data).decode("utf-8")
                root = ET.fromstring(data)
                for net in root:
                    if _local(net.tag) != "Network":
                        continue
                    for sta in net:
                        if _local(sta.tag) != "Station":
                            continue
                        lat = _float(_text(sta, "Latitude"))
                        lon = _float(_text(sta, "Longitude"))
                        elev = _float(_text(sta, "Elevation"))
                        for cha in sta:
                            if _local(cha.tag) != "Channel":
                                continue
                            sd = cha.get("startDate")
                            rows.append(
                                {
                                    "network": net.get("code"),
                                    "station": sta.get("code"),
                                    "latitude": lat,
                                    "longitude": lon,
                                    "elevation_in_m": elev,
                                    "location": cha.get("locationCode"),
                                    "channel": cha.get("code"),
                                    "start_date": pd.Timestamp(sd)
                                    if sd is not None
                                    else None,
                                }
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "network", "station", "latitude", "longitude",
                    "elevation_in_m", "location", "channel", "start_date",
                ],
            )

    return df.mapInPandas(run, STATIONXML_CHANNEL_SCHEMA)
