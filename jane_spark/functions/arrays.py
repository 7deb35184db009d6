"""Array/vector scalar surface (SURVEY.md §2 H8, K3).

jane stores float arrays (waveform min/max previews); the north-star
extension adds embedding vectors. Everything here uses Spark's
higher-order functions (transform/aggregate/zip_with) — JVM-side,
codegen-friendly, and with *sequential* accumulation order, which is
what makes double-precision results reproducible against the DuckDB
oracle's list_aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_sum(arr: Column) -> Column:
    """Sequential left-fold sum of a float array, accumulated in double."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; denominator as sqrt(na)*sqrt(nb) to mirror the
    conventional formula (and DuckDB's list_cosine_similarity)."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the two ``norm()`` factors precomputed.

    Higher-order-function expressions are interpreted (no whole-stage
    codegen), so on a PAIR join :func:`cosine` pays three array folds
    per pair — two of which (the norms) depend on one side only.
    Computing ``norm(v)`` once per vector ROW before the join and
    passing the doubles in makes the per-pair work a single fold
    (guide §1.2 "don't compute things you throw away"). Bit-identical:
    ``na``/``nb`` are the same ``norm`` expression evaluated on the
    same values, and the final ``dot / (na * nb)`` performs the same
    IEEE ops in the same order as :func:`cosine`."""
    return dot(a, b) / (na * nb)


def block_minmax(samples: Column, block: int) -> Column:
    """Per-block (min, max) pairs over a sample array — jane's preview
    downsampling (SURVEY.md D7: 60 s min/max preview per trace) without
    a per-sample explode: one output element per block via slice inside
    transform, all codegen. Block count = ceil(len/block)."""
    n_blocks = F.ceil(F.size(samples) / F.lit(block)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.struct(
            F.array_min(F.slice(samples, i * block + 1, block)).alias("pmin"),
            F.array_max(F.slice(samples, i * block + 1, block)).alias("pmax"),
        ),
    )
