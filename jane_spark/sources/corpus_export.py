"""Corpus export sink: the last stage of a training-data pipeline
(SURVEY.md §2.11 P-rows) — materialize the filtered/deduped/split
corpus as hive-partitioned Parquet that a downstream tokenizer fleet
can read partition-pruned.

Small-files discipline is the whole design. A naive
``df.write.partitionBy(...)`` lets EVERY task write one file per
partition value it happens to hold: with 10k tasks × (3 splits ×
5 langs) that is ~150k files per run — the classic 100 TB small-files
failure. The fix is to repartition on (partition cols + shard) FIRST,
so each output file is written by exactly one task, and the file count
is exactly ``n_partition_values × shards`` (± empty shards), chosen to
match the cluster's read parallelism. ``maxRecordsPerFile`` caps file
size as a backstop when a shard is unexpectedly large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_corpus(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("split", "lang"),
    shards: int = 4,
    shard_key: str | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned Parquet with a bounded, layout-
    independent file count.

    ``shards`` files per partition value, assigned by a deterministic
    hash of ``shard_key`` (defaults to the first non-partition column)
    — so re-running the export on the same data produces the same
    row→shard assignment regardless of input partitioning, mirroring
    the determinism rules of functions/sampling.py.
    """
    data_cols = [c for c in df.columns if c not in set(partition_cols)]
    if not data_cols:
        raise ValueError("export needs at least one non-partition column")
    key = shard_key or data_cols[0]
    shard = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(shards))
    out = df.repartition(*[F.col(c) for c in partition_cols], shard)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def export_manifest(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str] = ("split", "lang"),
) -> DataFrame:
    """Read-back manifest of an exported corpus: one row per hive
    partition with row/file counts — the post-export audit (file counts
    bounded by ``shards``, totals match the input)."""
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
    )


# ----------------------------------------------- WebDataset tar shards


def webdataset_shards(
    df: DataFrame,
    key_col: str,
    members: dict[str, str],
    n_shards: int,
    assign: str = "xxhash",
) -> DataFrame:
    """Pack samples into WebDataset-style tar shards (the standard
    sequential-read format for multimodal training loaders: each sample
    is a group of ``<key>.<ext>`` files, samples contiguous, one tar
    per shard).

    ``members`` maps tar extension → source column (string columns are
    UTF-8 encoded, binary pass through). Shard assignment is a
    deterministic hash of the sample key — layout-independent like
    every split in functions/sampling.py — and samples sort by key
    within their shard, so re-running on the same data yields
    byte-identical archives (tar metadata is zeroed: mtime/uid/gid
    fixed, USTAR format).

    ``assign``: ``"xxhash"`` (default — the fast JVM hash) or
    ``"md5"`` (functions/sampling.hash_bucket, salt ``"wds:"``) — the
    ENGINE-PORTABLE assignment an external oracle can reconstruct,
    which is what lets q_p10_roundtrip hash-check the whole shard
    layout against constructed SQL (VERDICT r13 #4).

    Returns one row per shard: (shard_id, n_samples, tar). ONE shuffle
    (the shard groupBy); each tar is built in one task's memory, so
    size shards via ``n_shards`` to the loader's shard budget (the
    usual ~100 MB–1 GB), exactly the constraint real WebDataset
    writers have.
    """
    import io
    import tarfile

    import pandas as pd

    if assign == "xxhash":
        shard = F.pmod(
            F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)
        )
    elif assign == "md5":
        from jane_spark.functions.sampling import hash_bucket

        shard = hash_bucket(F.col(key_col), n_shards, salt="wds:")
    else:
        raise ValueError(f"unknown assign mode {assign!r}")

    ext_cols = list(members.items())
    src = df.select(
        shard.cast("int").alias("shard_id"),
        F.col(key_col).cast("string").alias("__key"),
        *[F.col(c).alias(f"__m_{e}") for e, c in ext_cols],
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key", kind="mergesort")
        # duplicate sample keys would write colliding '<key>.<ext>'
        # members, and a reader's last-wins grouping silently drops all
        # but one sample (ADVICE r6) — refuse loudly instead; dedup or
        # re-key upstream
        dup = pdf["__key"].duplicated()
        if dup.any():
            raise ValueError(
                "webdataset_shards: duplicate sample keys in shard "
                f"{int(pdf['shard_id'].iloc[0])}: "
                f"{sorted(pdf['__key'][dup].unique())[:5]} — sample keys "
                "must be unique (dedup or re-key before export)"
            )
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for _, row in pdf.iterrows():
                for ext, _src in ext_cols:
                    data = row[f"__m_{ext}"]
                    if data is None:
                        continue  # absent member: sample simply lacks it
                    data = (
                        data.encode("utf-8") if isinstance(data, str) else bytes(data)
                    )
                    info = tarfile.TarInfo(name=f"{row['__key']}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    tf.addfile(info, io.BytesIO(data))
        payload = buf.getvalue()
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_samples": [len(pdf)],
                "tar": [payload],
            }
        )

    return src.groupBy("shard_id").applyInPandas(
        build, "shard_id int, n_samples long, tar binary"
    )


def write_webdataset(
    shards: DataFrame,
    out_dir: str,
    prefix: str = "shard",
) -> int:
    """Materialize shard rows as ``<prefix>-NNNNNN.tar`` files under
    ``out_dir``; returns the shard count. Writes happen executor-side
    in parallel (each shard row is independent); on a cluster point
    ``out_dir`` at shared storage."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def save(rows) -> None:
        for r in rows:
            with open(
                os.path.join(out_dir, f"{prefix}-{r['shard_id']:06d}.tar"), "wb"
            ) as f:
                f.write(bytes(r["tar"]))

    # persist across the two actions: without it, count() re-runs the
    # whole shuffle + tar packing a second time (applyInPandas cannot
    # be pruned to a count). DISK_ONLY: shard rows are ~100 MB–1 GB
    # archives — holding them in executor heap would evict real caches
    from pyspark import StorageLevel

    shards = shards.persist(StorageLevel.DISK_ONLY)
    try:
        shards.foreachPartition(save)
        return shards.count()
    finally:
        shards.unpersist()


def read_webdataset(
    spark: SparkSession,
    path: str,
    members: dict[str, str],
    glob: str = "*.tar",
) -> DataFrame:
    """Source twin of ``webdataset_shards``: scan ``shard-*.tar`` files
    (binaryFile — distributed, one task per shard) and un-tar each into
    sample rows: ``key`` + one binary column per requested extension
    (NULL when a sample lacks that member; unrequested extensions are
    ignored). Samples group by the member filename's stem, exactly the
    WebDataset convention, so archives produced by any writer load.
    ``glob`` guards against manifests/_SUCCESS markers sitting next to
    the shards on shared storage — only matching files are scanned."""
    import io
    import tarfile

    import pandas as pd

    ext_to_col = dict(members)
    out_cols = list(ext_to_col.values())
    schema = "key string, " + ", ".join(f"{c} binary" for c in out_cols)

    def untar(batches):
        for pdf in batches:
            keys: list[str] = []
            data: dict[str, list] = {c: [] for c in out_cols}
            for payload in pdf["content"]:
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(payload))) as tf:
                    for info in tf:
                        if not info.isfile() or "." not in info.name:
                            continue
                        key, ext = info.name.rsplit(".", 1)
                        if ext not in ext_to_col:
                            continue
                        samples.setdefault(key, {})[ext] = tf.extractfile(
                            info
                        ).read()
                for key in sorted(samples):
                    keys.append(key)
                    for ext, col in ext_to_col.items():
                        data[col].append(samples[key].get(ext))
            yield pd.DataFrame({"key": keys, **data})

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return binary.select("content").mapInPandas(untar, schema)


def webdataset_members(shards: DataFrame) -> DataFrame:
    """Audit twin of :func:`read_webdataset` over IN-PLAN shard rows:
    parse each ``(shard_id, tar)`` row's raw USTAR bytes back into one
    row per member — ``(shard_id, name, size, content_md5)``. This is
    the byte-level ROUND TRIP that q_p10_roundtrip hash-checks: the
    tar container Spark wrote is re-read by a real tar parser and the
    recovered membership must equal the table an oracle CONSTRUCTS
    arithmetically from the source rows (the q_a10_warc
    constructing-oracle pattern — the writer cannot pass by luck,
    because the oracle never touches the bytes). Scale shape: one
    mapInPandas over |shards| rows; each tar parses in the task that
    holds it, nothing returns to the driver."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

    def scan(batches):
        for pdf in batches:
            out = {
                "shard_id": [], "name": [], "size": [], "content_md5": []
            }
            for sid, payload in zip(pdf["shard_id"], pdf["tar"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(payload))) as tf:
                    for info in tf:
                        if not info.isfile():
                            continue
                        data = tf.extractfile(info).read()
                        out["shard_id"].append(int(sid))
                        out["name"].append(info.name)
                        out["size"].append(len(data))
                        out["content_md5"].append(
                            hashlib.md5(data).hexdigest()
                        )
            yield pd.DataFrame(out)

    return shards.select("shard_id", "tar").mapInPandas(
        scan, "shard_id int, name string, size bigint, content_md5 string"
    )
