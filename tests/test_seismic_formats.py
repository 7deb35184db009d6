"""SAC + MiniSEED codec tests (SURVEY.md §2 A1 — real waveform formats
without ObsPy): writer↔reader round trips, Steim-1/2 decompression, a
hand-built Steim-2 frame covering every packing density, format
sniffing, and the mixed-archive Spark ingest path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jane_spark.sources.seismic_formats import (
    _CM6 as _ALPHA,
    _steim_decode,
    crc32c,
    decode_cm6,
    encode_cm6,
    gse2_checksum,
    read_auto,
    read_gse2,
    read_mseed,
    read_mseed3,
    read_sac,
    sniff_format,
    write_gse2,
    write_mseed,
    write_mseed3,
    write_sac,
)

US = 1_000_000
T0 = 1_700_000_000 * US


def test_sac_round_trip_both_endians():
    samples = [1.5, -2.25, 3.0, 4.5, 0.0]
    for be in (True, False):
        blob = write_sac("BW", "ALTM", "", "EHZ", T0 + 123_000, 100.0, samples,
                         big_endian=be)
        rec = next(read_sac(blob))
        assert (rec["network"], rec["station"], rec["location"], rec["channel"]) == (
            "BW", "ALTM", "", "EHZ")
        assert rec["start_us"] == T0 + 123_000
        assert rec["sampling_rate"] == 100.0 and rec["npts"] == 5
        assert rec["samples"] == samples
        assert rec["end_us"] == rec["start_us"] + 40_000  # 4 intervals @100 Hz


def test_sac_rejects_garbage():
    with pytest.raises(ValueError, match="truncated"):
        next(read_sac(b"short"))
    with pytest.raises(ValueError, match="NVHDR"):
        next(read_sac(b"\x00" * 700))


@pytest.mark.parametrize("enc,name", [(1, "int16"), (3, "int32"), (4, "float32"),
                                      (5, "float64"), (10, "steim1")])
def test_mseed_round_trip(enc, name):
    rng = np.random.RandomState(7)
    if enc == 1:
        s = rng.randint(-30000, 30000, 300).tolist()
    elif enc in (3, 10):
        s = np.cumsum(rng.randint(-100000, 100000, 500)).tolist()
    else:
        s = [float(x) for x in rng.randn(150).round(4)]
    blob = write_mseed("GR", "FUR", "", "BHZ", T0, 20.0, s, encoding=enc)
    assert len(blob) % 512 == 0
    recs = list(read_mseed(blob))
    got = [x for r in recs for x in r["samples"]]
    if enc in (4, 5):
        assert np.allclose(got, s)
    else:
        assert got == [int(x) for x in s]
    assert recs[0]["start_us"] == T0
    assert all(r["sampling_rate"] == 20.0 and r["quality"] == "D" for r in recs)
    # record boundaries stay time-contiguous
    for prev, nxt in zip(recs, recs[1:]):
        assert nxt["start_us"] == prev["start_us"] + round(prev["npts"] / 20.0 * US)


def test_mseed_steim1_wide_differences():
    s = [0, 2**30, -(2**30), 5, 6, 7]  # forces the 32-bit diff path
    got = [x for r in read_mseed(write_mseed("XX", "TEST", "", "BHZ", 0, 1.0, s,
                                             encoding=10))
           for x in r["samples"]]
    assert got == s


def test_mseed_quality_and_location_codes():
    blob = write_mseed("BW", "MANZ", "00", "EHE", T0, 50.0, [1, 2, 3],
                       quality="Q", encoding=3)
    rec = next(read_mseed(blob))
    assert rec["quality"] == "Q" and rec["location"] == "00"


def _frame(nibbles, words):
    nib = 0
    for c in nibbles:
        nib = (nib << 2) | c
    return struct.pack(">I", nib << (2 * (16 - len(nibbles)))) + b"".join(
        struct.pack(">I", w & 0xFFFFFFFF) for w in words
    ) + b"\x00" * (64 - 4 - 4 * len(words))


def test_steim2_hand_built_all_densities():
    """One frame exercising every Steim-2 packing: 4x8, 1x30, 2x15,
    3x10, 5x6, 6x5, 7x4 — decoded against the independently-computed
    sample series."""
    diffs = [
        [0, 1, -1, 2],                      # ck=1: four 8-bit (first ignored)
        [-(2**29)],                          # ck=2 dnib=1: one 30-bit
        [16000, -16000],                    # ck=2 dnib=2: two 15-bit
        [500, -500, 120],                   # ck=2 dnib=3: three 10-bit
        [31, -31, 20, -20, 10],             # ck=3 dnib=0: five 6-bit
        [15, -15, 8, -8, 4, -4],            # ck=3 dnib=1: six 5-bit
        [7, -7, 3, -3, 1, -1, 2],           # ck=3 dnib=2: seven 4-bit
    ]

    def pack8(ds):
        w = 0
        for d in ds:
            w = (w << 8) | (d & 0xFF)
        return w

    def sub(ds, bits, dnib):
        w = 0
        for d in ds:
            w = (w << bits) | (d & ((1 << bits) - 1))
        return (dnib << 30) | w

    flat = [d for chunk in diffs for d in chunk]
    samples = [0]
    for d in flat[1:]:
        samples.append(samples[-1] + d)
    words = [
        samples[0],                  # x0
        samples[-1],                 # xn
        pack8(diffs[0]),
        sub(diffs[1], 30, 1),
        sub(diffs[2], 15, 2),
        sub(diffs[3], 10, 3),
        sub(diffs[4], 6, 0),
        sub(diffs[5], 5, 1),
        sub(diffs[6], 4, 2),
    ]
    nibbles = [0, 0, 0, 1, 2, 2, 2, 3, 3, 3]  # word0 + x0 + xn + payloads
    frames = _frame(nibbles, words)
    out = _steim_decode(frames, len(samples), ">", steim2=True)
    assert out.tolist() == samples


def test_steim_reverse_constant_guard():
    s = [1, 2, 3, 4]
    blob = bytearray(write_mseed("XX", "T", "", "BHZ", 0, 1.0, s, encoding=10))
    # corrupt xn (frame 0 word 2 lives at data offset 64 + 8)
    struct.pack_into(">I", blob, 64 + 8, 999)
    with pytest.raises(ValueError, match="reverse constant"):
        list(read_mseed(bytes(blob)))


def test_mseed_time_correction_respects_activity_flag():
    """SEED 2.4 field 16: the 0.0001 s time correction is added only
    while activity-flag bit 1 ('time correction applied') is clear;
    records that already folded it into BTIME must not double-shift."""
    blob = bytearray(write_mseed("BW", "ALTM", "", "EHZ", T0, 20.0, [1, 2, 3],
                                 encoding=3))
    struct.pack_into(">i", blob, 40, 50_000)  # +5 s correction (0.0001 s units)
    assert next(read_mseed(bytes(blob)))["start_us"] == T0 + 5 * US
    blob[36] |= 0x02  # correction already applied → reader must NOT re-add
    assert next(read_mseed(bytes(blob)))["start_us"] == T0


def test_mseed_sub_1hz_rate_round_trip():
    """0.1 Hz (VHZ/LHZ band) must use the negative-factor encoding, not
    silently round to factor 0 / rate 0.0."""
    for rate, n in ((0.1, 4), (0.4, 5), (2.5, 5)):
        blob = write_mseed("GR", "WET", "", "VHZ", T0, rate, [1, 2, 3, 4][:n],
                           encoding=3)
        rec = next(read_mseed(blob))
        assert rec["sampling_rate"] == pytest.approx(rate, rel=1e-9)
        assert rec["end_us"] > rec["start_us"]


def test_mseed_unrepresentable_rate_raises():
    import math

    with pytest.raises(ValueError, match="not representable"):
        write_mseed("XX", "T", "", "BHZ", 0, math.pi, [1, 2], encoding=3)
    with pytest.raises(ValueError, match="non-positive"):
        write_mseed("XX", "T", "", "BHZ", 0, 0.0, [1, 2], encoding=3)


@pytest.mark.parametrize("word,val,msg", [
    (0, -12345, "reference time"),    # NZYEAR
    (9, -12345, "NPTS"),              # NPTS sentinel
    (9, 0, "NPTS"),                   # zero samples
    (35, -12345, "LEVEN"),            # LEVEN sentinel
])
def test_sac_undefined_header_sentinels(word, val, msg):
    """Undefined (-12345) NZ*/NPTS/LEVEN headers must raise clear
    ValueErrors, not surface as datetime/numpy internals (ADVICE r3)."""
    blob = bytearray(write_sac("BW", "ALTM", "", "EHZ", T0, 100.0, [1.0, 2.0]))
    struct.pack_into(">i", blob, 280 + 4 * word, val)
    with pytest.raises(ValueError, match=msg):
        next(read_sac(bytes(blob)))


def test_sniff_format():
    from jane_spark.sources.waveform_format import write_record

    assert sniff_format(write_sac("N", "S", "", "C", 0, 1.0, [0.0] * 3)) == "sac"
    assert sniff_format(write_mseed("N", "S", "", "C", 0, 1.0, [1])) == "mseed"
    assert sniff_format(write_record("N", "S", "", "C", 0, 1.0, [1])) == "jsw1"
    assert sniff_format(write_gse2("N", "S", "", "C", 0, 1.0, [1])) == "gse2"
    assert sniff_format(b"BEGIN GSE2.1\nMSG_TYPE DATA\n") == "gse2"
    assert sniff_format(write_mseed3("N", "S", "", "C", 0, 1.0, [1])) == "mseed3"
    # real GSE/IMS messages open with MSG_TYPE/MSG_ID or blank lines
    # before the waveform section — the sniff must not anchor at byte 0
    gse_body = write_gse2("N", "S", "", "C", 0, 1.0, [1, 2, 3])
    assert sniff_format(b"MSG_TYPE DATA\nMSG_ID 2023/042 ANY_NDC\n\n" + gse_body) == "gse2"
    assert sniff_format(b"\r\n\r\n" + gse_body) == "gse2"
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_format(b"\x00" * 700)
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_format(b"MSG_TYPE DATA\nno waveform section here\n")


def test_steim2_encoder_round_trip_all_densities():
    """Encode→decode identity through the Steim-2 writer across all
    seven packing densities (the hand-built-frame decoder test is the
    spec; this drives the same decoder from the new encoder)."""
    rng = np.random.RandomState(17)
    pieces = []
    for bound in (7, 15, 31, 127, 511, 16383, (1 << 29) - 1):
        pieces.append(rng.randint(-bound - 1, bound + 1, 40))
    series = np.cumsum(np.concatenate(pieces)).astype(np.int64)
    # clip into int32 so the stream is Steim-representable
    series = np.clip(series, -(1 << 30), (1 << 30) - 1).tolist()
    blob = write_mseed("BW", "MANZ", "", "BHZ", T0, 20.0, series, encoding=11)
    recs = list(read_mseed(blob))
    assert all(r["encoding"] == 11 for r in recs)
    got = [s for r in recs for s in r["samples"]]
    assert got == series
    # Steim-2 packs markedly tighter than Steim-1 on small-diff data
    small = np.cumsum(rng.randint(-3, 4, 2000)).tolist()
    s2 = write_mseed("BW", "X", "", "C", T0, 20.0, small, encoding=11)
    s1 = write_mseed("BW", "X", "", "C", T0, 20.0, small, encoding=10)
    assert len(s2) < len(s1)
    assert [s for r in read_mseed(s2) for s in r["samples"]] == small


def test_steim2_overflow_falls_back_to_steim1():
    """A clipped ±2^30 spike overflows Steim-2's 30-bit widest word but
    fits Steim-1's 32-bit escape: the record demotes itself (blockette
    1000 reflects it) instead of failing the cut task."""
    s = [0, (1 << 30), -(1 << 30), 5, 6, 7]
    blob = write_mseed("N", "S", "", "C", T0, 1.0, s, encoding=11)
    recs = list(read_mseed(blob))
    assert [x for r in recs for x in r["samples"]] == s
    assert all(r["encoding"] == 10 for r in recs)


def test_steim_overflow_falls_back_to_int32():
    """A full int32 swing (diff ~2^32) overflows even Steim-1's escape
    word — the record lands uncompressed int32, still byte-exact."""
    lo, hi = -(1 << 31), (1 << 31) - 1
    s = [0, hi, lo, hi, 0]
    blob = write_mseed("N", "S", "", "C", T0, 1.0, s, encoding=11)
    recs = list(read_mseed(blob))
    assert [x for r in recs for x in r["samples"]] == s
    assert all(r["encoding"] == 3 for r in recs)


def test_steim_fallback_is_per_record():
    """Records before a late spike keep the requested Steim-2 encoding;
    only the record containing the overflow demotes."""
    smooth = np.cumsum(np.random.RandomState(3).randint(-5, 6, 2000)).tolist()
    s = smooth + [(1 << 30), -(1 << 30)] + smooth[:10]
    blob = write_mseed("N", "S", "", "C", T0, 100.0, s, encoding=11)
    recs = list(read_mseed(blob))
    assert [x for r in recs for x in r["samples"]] == s
    encs = [r["encoding"] for r in recs]
    assert encs[0] == 11 and 10 in encs


def test_mseed3_steim_overflow_fallback():
    s = [0, (1 << 30), -(1 << 30), 5, 6, 7]
    rec = next(read_mseed3(write_mseed3("N", "S", "", "C", T0, 1.0, s, encoding=11)))
    assert rec["samples"] == s and rec["encoding"] == 10
    lo, hi = -(1 << 31), (1 << 31) - 1
    wide = [0, hi, lo, hi, 0]
    rec = next(read_mseed3(write_mseed3("N", "S", "", "C", T0, 1.0, wide, encoding=11)))
    assert rec["samples"] == wide and rec["encoding"] == 3


def test_steim2_encoder_first_diff_clamp():
    """A first sample outside 30 bits is representable: x0 is stored in
    the frame header and the first difference's value is ignored by
    decoders, so the encoder clamps it rather than failing."""
    series = [(1 << 30) + 5, (1 << 30) + 6, (1 << 30) + 4]
    blob = write_mseed("N", "S", "", "C", T0, 1.0, series, encoding=11)
    assert next(read_mseed(blob))["samples"] == series


# ---------------------------------------------------------- MiniSEED 3


def test_crc32c_check_value():
    """The standard CRC-32C check vector (RFC 3720 appendix): the CRC
    of ASCII '123456789' is 0xE3069283."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@pytest.mark.parametrize(
    "enc,series",
    [
        (1, [100, -200, 300, -400]),
        (3, [2**28, -(2**28), 7, 0]),
        (4, [1.5, -2.25, 3.0]),
        (5, [1e-12, 3.141592653589793, -2.5]),
        (10, list(np.cumsum(np.arange(100)) % 5000)),
        (11, list(np.cumsum(np.arange(100)) % 5000)),
    ],
)
def test_mseed3_round_trip(enc, series):
    series = [int(v) for v in series] if enc not in (4, 5) else series
    blob = write_mseed3("BW", "ALTM", "", "EHZ", T0 + 123_456, 200.0,
                        series, encoding=enc)
    rec = next(read_mseed3(blob))
    got = rec["samples"] if enc not in (4, 5) else [float(v) for v in rec["samples"]]
    if enc == 4:
        assert got == [float(np.float32(v)) for v in series]
    else:
        assert got == series
    assert (rec["network"], rec["station"], rec["channel"]) == ("BW", "ALTM", "EHZ")
    assert rec["start_us"] == T0 + 123_456
    assert rec["sampling_rate"] == 200.0
    assert rec["encoding"] == enc and rec["pubversion"] == 1


def test_mseed3_single_record_unlimited_frames():
    """v3 has no record-length cap: a series far beyond the v2 7-frame
    capacity round-trips through ONE record (the whole point of the
    max_frames=None frame packer)."""
    rng = np.random.RandomState(5)
    series = np.cumsum(rng.randint(-100, 100, 5000)).tolist()
    blob = write_mseed3("II", "AAK", "10", "BHZ", T0, 40.0, series)
    recs = list(read_mseed3(blob))
    assert len(recs) == 1
    assert recs[0]["npts"] == 5000
    assert recs[0]["samples"] == series
    assert recs[0]["location"] == "10"


def test_mseed3_crc_corruption_raises():
    blob = bytearray(write_mseed3("BW", "X", "", "HHZ", T0, 100.0, [1, 2, 3]))
    blob[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32C mismatch"):
        next(read_mseed3(bytes(blob)))


def test_mseed3_multi_record_buffer_and_auto():
    b1 = write_mseed3("BW", "A", "", "EHZ", T0, 100.0, [1, 2, 3])
    b2 = write_mseed3("GR", "B", "00", "LHZ", T0 + US, 1.0, [9, 8],
                      encoding=3, pubver=2)
    recs = list(read_auto(b1 + b2))
    assert [(r["network"], r["station"], r["pubversion"]) for r in recs] == [
        ("BW", "A", 1), ("GR", "B", 2),
    ]
    assert recs[1]["pos"] == len(b1)


def test_mseed3_sid_non_seed_channel():
    """Channels that are not 3-char SEED codes ride whole in the source
    segment of the FDSN SID and round-trip unchanged."""
    blob = write_mseed3("XX", "TEST", "", "temperature", T0, 1.0, [4, 5])
    assert next(read_mseed3(blob))["channel"] == "temperature"


# ----------------------------------------------------------- GSE2/CM6


def test_cm6_codec_vectors():
    """Known-value vectors for the 6-bit scheme: 0 → '+', small values
    single-char, sign bit, 5-bit continuation groups (big-endian)."""
    assert encode_cm6([0]) == "+"
    assert encode_cm6([1]) == "-"
    assert encode_cm6([15]) == "D"
    assert encode_cm6([-1]) == "F"  # 16|1 = 17 → alphabet[17]
    # 16 needs a continuation char: first carries 16>>5 = 0 with the
    # continuation flag, the second carries 16 & 31
    assert encode_cm6([16]) == _ALPHA[32] + _ALPHA[16]
    assert decode_cm6(_ALPHA[32] + _ALPHA[16]) == [16]
    for vals in ([0, 1, -1, 15, 16, -16, 511, -512], [123456789, -987654321]):
        assert decode_cm6(encode_cm6(vals)) == vals
    # whitespace from 80-column wrapping is transparent
    enc = encode_cm6([100, -200, 300])
    assert decode_cm6(enc[:3] + "\n" + enc[3:]) == [100, -200, 300]
    with pytest.raises(ValueError, match="dangling"):
        decode_cm6(_ALPHA[32 | 1])  # continuation flag with no successor


def test_gse2_checksum_reference_values():
    """The CHK2 algorithm: plain sum for small data; per-sample and
    running-sum modulo folds (C-truncating division) for large; final
    abs. Both arithmetic variants: positive-sum and negative-sum data
    must agree with their mirrored series (abs at the end)."""
    assert gse2_checksum([1, 2, 3]) == 6
    assert gse2_checksum([-1, -2, -3]) == 6  # abs of -6
    # per-sample fold: 150_000_000 → 50_000_000
    assert gse2_checksum([150_000_000]) == 50_000_000
    # running-sum fold: 60M + 60M = 120M → 20M
    assert gse2_checksum([60_000_000, 60_000_000]) == 20_000_000
    # negative running sum folds toward zero (trunc, not floor)
    assert gse2_checksum([-60_000_000, -60_000_000]) == 20_000_000


def test_gse2_round_trip_cm6_and_int():
    rng = np.random.RandomState(7)
    series = np.cumsum(rng.randint(-5000, 5000, 300)).tolist()
    for datatype in ("CM6", "INT"):
        blob = write_gse2("BW", "MANZ", "", "BHZ", T0 + 250_000, 20.0,
                          series, datatype=datatype)
        rec = next(read_gse2(blob))
        assert rec["samples"] == series
        assert (rec["network"], rec["station"], rec["channel"]) == ("BW", "MANZ", "BHZ")
        assert rec["start_us"] == T0 + 250_000
        assert rec["sampling_rate"] == 20.0
        assert rec["npts"] == 300
        assert rec["quality"] == "D" and rec["location"] == ""


def test_gse2_round_trip_checksum_variants():
    """Round-trip both checksum arithmetic variants: data whose running
    sum stays positive, and data dominated by large negatives where the
    modulo fold goes through truncating (not flooring) division."""
    positive = list(range(0, 3000, 7))
    negative = [-90_000_000, -90_000_000, -90_000_000, 5, -7]
    for series in (positive, negative):
        blob = write_gse2("GR", "FUR", "", "LHZ", T0, 1.0, series)
        rec = next(read_gse2(blob))
        assert rec["samples"] == series


def test_gse2_checksum_mismatch_raises():
    blob = write_gse2("BW", "MANZ", "", "BHZ", T0, 20.0, [1, 2, 3, 4])
    # corrupt one data character; either the checksum or (if the damage
    # changes the value count) the npts guard must fire
    txt = blob.decode().splitlines()
    assert txt[2] and not txt[2].startswith("CHK2")
    txt[2] = txt[2][:-1] + ("5" if txt[2][-1] != "5" else "6")
    with pytest.raises(ValueError, match="checksum mismatch|samples decoded"):
        next(read_gse2(("\n".join(txt) + "\n").encode()))


def test_gse2_multi_trace_and_skipped_subheaders():
    """Two WID2 blocks in one buffer (+ an STA2 sub-header line, which
    the reader must skip) parse to two index rows with correct pos
    offsets pointing at their WID2 lines."""
    b1 = write_gse2("BW", "ALTM", "", "EHE", T0, 100.0, [1, 2, 3]).decode()
    lines = b1.splitlines()
    lines.insert(1, "STA2 BAYERN    48.99500   12.20700 WGS-84     0.430 0.000")
    b2 = write_gse2("GR", "FUR", "", "BHZ", T0 + US, 20.0, [-4, -5, -6]).decode()
    blob = ("\n".join(lines) + "\n" + b2).encode()
    recs = list(read_gse2(blob))
    assert [(r["station"], r["samples"]) for r in recs] == [
        ("ALTM", [1, 2, 3]), ("FUR", [-4, -5, -6]),
    ]
    assert recs[0]["pos"] == 0
    assert blob[recs[1]["pos"] : recs[1]["pos"] + 5] == b"WID2 "


def test_gse2_rejects_garbage():
    with pytest.raises(ValueError, match="no WID2"):
        next(read_gse2(b"BEGIN GSE2.1\nno waveform here\n"))
    blob = write_gse2("BW", "X", "", "C", T0, 1.0, [1, 2])
    with pytest.raises(ValueError, match="unsupported datatype"):
        next(read_gse2(blob.replace(b" CM6 ", b" CM8 ")))


def test_mixed_archive_spark_ingest(spark, tmp_path):
    """binaryFile scan over a directory mixing all three formats →
    parse_waveform_files sniffs per file and emits one uniform trace
    index (the jane multi-format ingest path, A1+J1)."""
    from jane_spark.sources.ingest import parse_waveform_files, scan_files
    from jane_spark.sources.waveform_format import write_record

    (tmp_path / "a.sac").write_bytes(
        write_sac("BW", "ALTM", "", "EHZ", T0, 100.0, [1.0, 2.0, 3.0]))
    (tmp_path / "b.mseed").write_bytes(
        write_mseed("GR", "FUR", "", "BHZ", T0, 20.0,
                    np.cumsum(np.arange(200)).tolist(), quality="R", encoding=10))
    (tmp_path / "c.jsw").write_bytes(
        write_record("IU", "ANMO", "00", "BHZ", T0, 40.0, [5, 6, 7]))
    (tmp_path / "d.gse").write_bytes(
        write_gse2("NO", "KONO", "", "LHZ", T0, 1.0, [10, 20, 30, 40]))
    (tmp_path / "e.ms3").write_bytes(
        write_mseed3("II", "AAK", "10", "BHZ", T0, 40.0, list(range(600))))

    idx = parse_waveform_files(scan_files(spark, str(tmp_path))).collect()
    by_net = {}
    for r in idx:
        by_net.setdefault(r["network"], []).append(r)
    assert {r["station"] for r in by_net["BW"]} == {"ALTM"}
    assert by_net["BW"][0]["sampling_rate"] == 100.0
    assert sum(r["npts"] for r in by_net["GR"]) == 200
    assert all(r["quality"] == "R" for r in by_net["GR"])
    assert by_net["IU"][0]["location"] == "00"
    assert by_net["NO"][0]["station"] == "KONO"
    assert by_net["NO"][0]["npts"] == 4
    assert by_net["II"][0]["npts"] == 600  # one v3 record, unlimited frames


# ------------------------------------------------------ property tests


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**29), max_value=2**29 - 1), max_size=50))
def test_cm6_codec_property_round_trip(values):
    from jane_spark.sources.seismic_formats import decode_cm6, encode_cm6

    assert decode_cm6(encode_cm6(values)) == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**28), max_value=2**28 - 1),
        min_size=1,
        max_size=400,
    )
)
def test_steim2_property_round_trip(diffs):
    """Any int series whose successive differences fit 30 bits encodes
    and decodes identically through Steim-2 v2 records."""
    from jane_spark.sources.seismic_formats import read_mseed, write_mseed

    series = np.cumsum(np.asarray(diffs, dtype=np.int64))
    series = np.clip(series, -(2**30), 2**30 - 1).tolist()
    blob = write_mseed("XX", "PROP", "", "HHZ", T0, 100.0, series, encoding=11)
    assert [s for r in read_mseed(blob) for s in r["samples"]] == series


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**28), max_value=2**28 - 1),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from([1_000_000, 333_333, 987_654_321]),
)
def test_mseed3_property_round_trip(diffs, offset_us):
    from jane_spark.sources.seismic_formats import read_mseed3, write_mseed3

    series = np.clip(
        np.cumsum(np.asarray(diffs, dtype=np.int64)), -(2**30), 2**30 - 1
    ).tolist()
    rec = next(read_mseed3(
        write_mseed3("XX", "PROP", "", "HHZ", T0 + offset_us, 100.0, series)
    ))
    assert rec["samples"] == series
    assert rec["start_us"] == T0 + offset_us


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=30))
def test_gse2_checksum_property(samples):
    """CHK2 is order-sensitive but sign-symmetric: |checksum| of the
    negated series equals the original's, and the value is always in
    [0, 1e8)."""
    from jane_spark.sources.seismic_formats import gse2_checksum

    c = gse2_checksum(samples)
    assert 0 <= c < 100_000_000
    assert gse2_checksum([-s for s in samples]) == c


def test_read_auto_samples_agree_across_formats():
    """The same series written as SAC and as MiniSEED int32 decodes to
    identical samples and identical index metadata through read_auto."""
    s = [float(v) for v in np.cumsum(np.arange(50)) % 997]
    sac = next(read_auto(write_sac("BW", "X", "", "HHZ", T0, 10.0, s)))
    ms = next(read_auto(write_mseed("BW", "X", "", "HHZ", T0, 10.0,
                                    [int(v) for v in s], encoding=3)))
    assert sac["samples"] == [float(v) for v in ms["samples"]]
    for key in ("network", "station", "channel", "start_us", "sampling_rate", "npts"):
        assert sac[key] == ms[key], key
