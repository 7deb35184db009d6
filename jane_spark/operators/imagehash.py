"""Perceptual image hashing and image near-duplicate detection — the
multimodal analogue of the K2 text near-dup family (SURVEY.md §2 K7).

A LAION-scale image corpus is deduplicated the same way a text corpus
is: per-item signature, then a bucketed candidate join — never an
all-pairs scan. The signature here is the public 64-bit DCT pHash
(pHash.org; the `imagehash` library's `phash`): resize to 32x32
grayscale, 2-D DCT-II, keep the 8x8 low-frequency block, threshold at
its median. Visually-identical-up-to-noise images land within a small
Hamming radius; unrelated images are ~32 bits apart in expectation.

Distributed shape:
- ``phash_images``      — Arrow-batched ``mapInPandas`` over the binary
  payload column (decode via the registered pure-stdlib codecs —
  PGM/PPM/BMP/PNG/GIF); undecodable rows yield NULL, keeping the
  operator total (same policy as sources/multimodal.py).
- ``phash_near_pairs``  — 8-block pigeonhole banding on the 64-bit
  hash: Hamming <= 7 guarantees at least one 8-bit block equal, so
  candidates come from 8 equi-joins on (block index, block value) and
  the exact ``bit_count(xor)`` residual filters them. Per-bucket
  cardinality bounds the join, exactly like simhash_near_pairs
  (operators/dedup.py) — the 100 TB shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 32x32 orthonormal DCT-II basis, built once: M[k, n] = c_k cos(pi (2n+1) k / 64)
_N = 32


def _dct_matrix(n: int = _N) -> np.ndarray:
    k = np.arange(n, dtype=np.float64).reshape(-1, 1)
    x = np.arange(n, dtype=np.float64).reshape(1, -1)
    m = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT = _dct_matrix()


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of a decoded image array (H, W) or
    (H, W, C) uint8 — the NumPy reference implementation shared by the
    Spark path and the tests. Returns a SIGNED 64-bit value (two's
    complement) so it stores in a Spark ``long`` unchanged."""
    from jane_spark.sources.media_codecs import nearest_resize

    a = np.asarray(img)
    if a.ndim == 3:  # color-channel mean as grayscale (alpha excluded so
        # an RGBA decode hashes identically to its RGB twin)
        a = a[..., :3].astype(np.float64).mean(axis=2)
    a = nearest_resize(a.astype(np.uint8), _N, _N).astype(np.float64)
    t = _DCT @ a @ _DCT.T
    low = t[:8, :8].ravel()
    med = np.median(low)
    bits = low > med
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def phash_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type_col: str = "media_type",
) -> DataFrame:
    """``(id, phash)`` per image row via Arrow-batched ``mapInPandas``.

    Decode goes through the registered image codecs
    (sources/multimodal.py CODECS); rows whose media type has no codec
    or whose payload fails to decode come back with NULL ``phash`` —
    the operator is total and a corrupt object never kills the stage.
    """
    import pandas as pd

    out_schema = f"{id_col} long, phash long"

    def run(batches):
        from jane_spark.sources.multimodal import CODECS

        for pdf in batches:
            hashes = []
            for data, mt in zip(pdf[payload_col], pdf[media_type_col]):
                if mt not in CODECS:
                    hashes.append(None)
                    continue
                try:
                    hashes.append(phash64(CODECS[mt](bytes(data))))
                except Exception:
                    hashes.append(None)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return df.mapInPandas(run, out_schema)


def dct_coeff_df(spark, n: int = _N, k_max: int = 8) -> DataFrame:
    """The low-frequency rows of the orthonormal DCT-II matrix as a
    (k, n, m) DataFrame, every coefficient rounded 9 dp — the float-
    boundary playbook: JVM Math.cos and any other engine's libm cos
    agree long before the 9th decimal, so the rounded constants are
    engine-identical."""
    import math

    k = F.col("k")
    x = F.col("n")
    rows = (
        spark.range(k_max)
        .withColumnRenamed("id", "k")
        .crossJoin(spark.range(n).withColumnRenamed("id", "n"))
    )
    ck = F.when(k == 0, F.lit(1.0 / math.sqrt(2.0))).otherwise(F.lit(1.0))
    m = (
        ck
        * F.cos(F.lit(math.pi) * (2 * x + 1) * k / F.lit(2.0 * n))
        * F.lit(math.sqrt(2.0 / n))
    )
    return rows.select("k", "n", F.round(m, 9).alias("m"))


def phash_relational(
    pixels: DataFrame,
    id_col: str = "item_id",
    row_col: str = "r",
    col_col: str = "c",
    val_col: str = "v",
) -> DataFrame:
    """PORTABLE 64-bit DCT pHash over a long-form pixel table — the
    JVM-side scale path beside the codec-decoding ``phash_images``
    (the ivf_portable pattern: same algorithm, explicit determinism
    discipline, zero Python in the plan).

    Input: one row per (item, r, c) pixel of an already-32×32
    grayscale image (decode/resize upstream). The chain is the fixed
    linear algebra pHash is made of: separable DCT as TWO broadcast-
    join aggregations against the 8×32 rounded coefficient table
    (row pass then column pass, each sum rounded 6 dp — sub-ulp
    shuffle-order wobble can't cross a 5e-7 boundary), the median of
    the 64 low-frequency values via row_number 32/33 (numpy's even-n
    definition, (k, l) tie-break), bits packed into a signed 64-bit
    long with the i=63 term negative (two's complement without
    overflow).

    Scale shape: two aggregations keyed by (item, k|l) + one
    item-keyed window + one item-keyed final sum — embarrassingly
    parallel over items; the coefficient table is 256 rows,
    broadcast."""
    spark = pixels.sparkSession
    M = dct_coeff_df(spark)
    m1 = M.select(
        F.col("k"), F.col("n").alias(row_col), F.col("m").alias("m1")
    )
    u = (
        pixels.join(F.broadcast(m1), row_col)
        .groupBy(id_col, "k", col_col)
        .agg(F.round(F.sum(F.col("m1") * F.col(val_col)), 6).alias("u"))
    )
    m2 = M.select(
        F.col("k").alias("l"), F.col("n").alias(col_col), F.col("m").alias("m2")
    )
    t = (
        u.join(F.broadcast(m2), col_col)
        .groupBy(id_col, "k", "l")
        .agg(F.round(F.sum(F.col("m2") * F.col("u")), 6).alias("t"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("t").asc(), F.col("k").asc(), F.col("l").asc()
    )
    ranked = t.withColumn("rn", F.row_number().over(w))
    med = (
        ranked.filter(F.col("rn").isin(32, 33))
        .groupBy(id_col)
        .agg(F.avg("t").alias("med"))
    )
    bits = (
        ranked.join(med, id_col)
        .withColumn("i", (F.col("k") * 8 + F.col("l")).cast("int"))
    )
    term = F.when(
        F.col("t") > F.col("med"),
        F.expr(
            "CASE WHEN i = 63 THEN CAST(-9223372036854775807 AS BIGINT)"
            " - CAST(1 AS BIGINT)"
            " ELSE shiftleft(CAST(1 AS BIGINT), i) END"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return bits.groupBy(id_col).agg(
        F.sum(term).cast("long").alias("phash")
    )


def phash_near_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str = "phash",
    max_hamming: int = 6,
) -> DataFrame:
    """Perceptual near-dup candidate pairs within a Hamming radius via
    8-block pigeonhole banding (``<= 7`` differing bits guarantee at
    least one equal 8-bit block) — delegates to the shared
    ``banded_hamming_pairs`` join that also powers SimHash. Works on
    any 64-bit signature column (image ``phash``, audio ``afp``).
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, distinct.
    """
    from jane_spark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        sig, id_col, hash_col, n_blocks=8, block_bits=8,
        max_hamming=max_hamming,
    )


# ---------------------------------------------------- audio fingerprinting
# The same perceptual-hash philosophy applied to sound (Haitsma &
# Kalker 2002 band-energy fingerprinting, reduced to a 64-bit item
# signature): an 8x8 time-by-frequency energy grid thresholded at its
# median. Near-dup joins reuse phash_near_pairs unchanged — it bands
# any 64-bit column.

_N_SEG = 8
_N_BAND = 8


def audio_fp64(samples: np.ndarray, rate: int) -> int:
    """64-bit spectral fingerprint of a decoded clip: mono-mix, split
    into 8 equal time segments, 8 log-spaced FFT band energies each
    (200 Hz .. Nyquist), log-compressed, thresholded at the median of
    the 8x8 grid. NumPy reference shared by the Spark path and tests;
    signed 64-bit for Spark ``long`` storage."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:  # (n, channels) -> mono mean
        s = s.mean(axis=1)
    n = len(s)
    seg_len = max(n // _N_SEG, 1)
    # clamp the low edge below Nyquist so low-rate audio (< 400 Hz)
    # still gets a valid increasing band layout instead of an all-zero
    # grid that would fingerprint every clip identically
    lo, hi = min(200.0, rate / 4.0), rate / 2.0
    edges = lo * (hi / lo) ** (np.arange(_N_BAND + 1) / _N_BAND)
    grid = np.zeros((_N_SEG, _N_BAND))
    for i in range(_N_SEG):
        seg = s[i * seg_len : (i + 1) * seg_len]
        if len(seg) == 0:
            continue
        mag = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
        for b in range(_N_BAND):
            sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
            grid[i, b] = np.log1p(mag[sel].sum()) if sel.any() else 0.0
    flat = grid.ravel()
    med = np.median(flat)
    v = 0
    for i, x in enumerate(flat):
        if x > med:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_fp_relational(
    samples: DataFrame,
    id_col: str = "item_id",
    seg_col: str = "seg",
    n_col: str = "n",
    val_col: str = "v",
    rate: int = 1024,
    seg_len: int = 64,
) -> DataFrame:
    """PORTABLE 64-bit audio fingerprint over a long-form sample
    table — the relational twin of ``audio_fp64`` (the
    phash_relational pattern applied to sound): the fingerprint is
    fixed linear algebra, so it runs as pure DataFrame ops with an
    explicit rounding discipline and zero Python in the plan.

    Input: one row per (item, segment 0..7, n 0..seg_len-1) sample of
    an already-segmented mono clip. Chain: direct DFT per segment as
    a broadcast join against the 9 dp-rounded (f, n) cos/sin table
    (re/im sums rounded 6 dp), magnitude sqrt(re²+im²) rounded 6 dp,
    log-spaced band energies (band map precomputed from
    ``audio_fp64``'s edge layout — every rfft bin maps to at most one
    band) summed and ``ln(1+x)``-compressed at 6 dp, the 64-value
    grid median via row_number 32/33, bits packed into a signed long
    with the i=63 term negative.

    Scale shape: one (item, seg, f)-keyed aggregation (the DFT), one
    (item, seg, band)-keyed aggregation, one item-keyed window + sum
    — embarrassingly parallel over clips; the Fourier table is
    (seg_len/2+1)×seg_len rows, broadcast."""
    import math

    spark = samples.sparkSession
    n_bins = seg_len // 2 + 1
    f_df = (
        spark.range(n_bins)
        .withColumnRenamed("id", "f")
        .crossJoin(spark.range(seg_len).withColumnRenamed("id", n_col))
    )
    ang = (
        F.lit(2.0 * math.pi) * F.col("f") * F.col(n_col) / F.lit(float(seg_len))
    )
    fourier = f_df.select(
        "f",
        n_col,
        F.round(F.cos(ang), 9).alias("cosv"),
        F.round(F.sin(ang), 9).alias("sinv"),
    )
    # band map from audio_fp64's log-spaced edge layout
    lo, hi = min(200.0, rate / 4.0), rate / 2.0
    edges = [lo * (hi / lo) ** (b / float(_N_BAND)) for b in range(_N_BAND + 1)]
    band_rows = []
    for f in range(n_bins):
        freq = f * rate / float(seg_len)
        for b in range(_N_BAND):
            if edges[b] <= freq < edges[b + 1]:
                band_rows.append((f, b))
    band_df = spark.createDataFrame(band_rows, "f long, band int")
    df = (
        samples.join(F.broadcast(fourier), n_col)
        .groupBy(id_col, seg_col, "f")
        .agg(
            F.round(F.sum(F.col(val_col) * F.col("cosv")), 6).alias("re"),
            F.round(F.sum(F.col(val_col) * F.col("sinv")), 6).alias("im"),
        )
        .select(
            id_col,
            seg_col,
            "f",
            F.round(
                F.sqrt(F.col("re") * F.col("re") + F.col("im") * F.col("im")),
                6,
            ).alias("mag"),
        )
    )
    energies = (
        df.join(F.broadcast(band_df), "f")
        .groupBy(id_col, seg_col, "band")
        .agg(F.round(F.sum("mag"), 6).alias("e"))
    )
    # full 8×8 grid: bands with no rfft bin carry 0.0 (the numpy
    # reference's `else 0.0` leg)
    frame = (
        samples.select(id_col)
        .distinct()
        .crossJoin(
            spark.range(_N_SEG).withColumnRenamed("id", seg_col)
        )
        .crossJoin(
            spark.range(_N_BAND).select(F.col("id").cast("int").alias("band"))
        )
    )
    grid = (
        frame.join(energies, [id_col, seg_col, "band"], "left")
        .select(
            id_col,
            seg_col,
            "band",
            F.round(F.log1p(F.coalesce(F.col("e"), F.lit(0.0))), 6).alias(
                "g"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("g").asc(), F.col(seg_col).asc(), F.col("band").asc()
    )
    ranked = grid.withColumn("rn", F.row_number().over(w))
    med = (
        ranked.filter(F.col("rn").isin(32, 33))
        .groupBy(id_col)
        .agg(F.avg("g").alias("med"))
    )
    bits = ranked.join(med, id_col).withColumn(
        "i", (F.col(seg_col) * 8 + F.col("band")).cast("int")
    )
    term = F.when(
        F.col("g") > F.col("med"),
        F.expr(
            "CASE WHEN i = 63 THEN CAST(-9223372036854775807 AS BIGINT)"
            " - CAST(1 AS BIGINT)"
            " ELSE shiftleft(CAST(1 AS BIGINT), i) END"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return bits.groupBy(id_col).agg(
        F.sum(term).cast("long").alias("afp")
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type_col: str = "media_type",
) -> DataFrame:
    """``(id, afp)`` per audio row via Arrow-batched ``mapInPandas``;
    decode through the registered audio codecs (PCM WAV built-in),
    NULL on missing codec or corrupt payload — total, like
    ``phash_images``. Feed the result to ``phash_near_pairs(...,
    hash_col='afp')`` for the bounded Hamming join."""
    import pandas as pd

    out_schema = f"{id_col} long, afp long"

    def run(batches):
        from jane_spark.sources.multimodal import AUDIO_CODECS

        for pdf in batches:
            fps = []
            for data, mt in zip(pdf[payload_col], pdf[media_type_col]):
                if mt not in AUDIO_CODECS:
                    fps.append(None)
                    continue
                try:
                    samples, rate = AUDIO_CODECS[mt](bytes(data))
                    fps.append(audio_fp64(samples, rate))
                except Exception:
                    fps.append(None)
            yield pd.DataFrame({id_col: pdf[id_col], "afp": fps})

    return df.mapInPandas(run, out_schema)
