"""K7: serving-layer key-value store build (the LMDB distribution).

The reference (make_dataset_lmdb.py:14-121 in /root/reference) heap-merges
24 sorted JSONL shards into a single LMDB: data db ``uuid16 -> compressed
json`` written with ``append=True`` (which REQUIRES globally sorted keys),
plus a class index ``type -> packed batches of 30 uuid16 keys`` in the
same global key order.

Spark-first split of that job:

- ``prepare_kv_dataset`` — everything parallel: key extraction (uuid hex
  from the record id tail), GLOBAL range-sort by key bytes, and disjoint
  ordered parquet runs.  This is the heap-merge, distributed: shard i's
  keys all sort before shard i+1's, so a sequential reader of shard 0..N
  sees the exact append order LMDB needs.
- ``class_index_batches`` — the type index, distributed: per-class
  row_number over the global key order, packed into batches of 30 hex
  keys (the reference's idx_batch_size).
- ``write_lmdb_store`` — the one inherently single-writer step: walk the
  sorted runs in order and append into LMDB.  The ``lmdb`` C library is
  not in this environment, so the writer is gated behind an import-try
  (same policy as the multimodal media decode): the plumbing up to the
  final put loop is real and tested; the call raises with a clear
  message when lmdb is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDX_BATCH = 30  # make_dataset_lmdb.py:22 idx_batch_size


def kv_records(merged: DataFrame) -> DataFrame:
    """(key_hex, cls, payload): the store rows — uuid hex key from the
    record id tail (byte order == hex lexical order, so sorting the hex
    string sorts uuid.bytes), class from the envelope rectype, payload =
    the record JSON."""
    return merged.select(
        F.lower(F.element_at(F.split(F.col("yuid"), "/"), -1)).alias("key_hex"),
        F.col("rectype").alias("cls"),
        F.col("data").alias("payload"),
    )


def prepare_kv_dataset(records: DataFrame, out_path: str, n_shards: int = 24) -> None:
    """Globally range-sorted parquet runs: repartitionByRange gives
    disjoint ordered key ranges per shard, sortWithinPartitions orders
    inside, so reading shards by number yields the reference's
    heap-merged stream without a driver-side heap."""
    (
        records.repartitionByRange(n_shards, "key_hex")
        .sortWithinPartitions("key_hex")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def class_index_batches(records: DataFrame, batch: int = IDX_BATCH) -> DataFrame:
    """(cls, batch_id, packed): the class index — per-class batches of up
    to ``batch`` keys, concatenated in global key order (the dupsort
    values the reference writes per class).  ``packed`` is BINARY in
    16-byte uuid strides — byte-compatible with the reference index
    (make_dataset_lmdb.py:68 packs uuid.bytes, read back in 16-byte
    strides at :105) and with ``write_lmdb_store`` below, which appends
    the same ``bytes.fromhex`` keys.  Hex lexical order == byte order,
    so sorting on key_hex sorts the packed bytes too."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("cls").orderBy("key_hex"))
    keys16 = F.transform(
        F.sort_array(F.collect_list("key_hex")),
        lambda k: F.unhex(F.regexp_replace(k, "-", "")),
    )
    return (
        records.withColumn("rn", rn)
        .withColumn("batch_id", ((F.col("rn") - 1) / batch).cast("long"))
        .groupBy("cls", "batch_id")
        .agg(
            F.aggregate(
                keys16, F.lit(b""), lambda acc, x: F.concat(acc, x)
            ).alias("packed")
        )
    )


def write_lmdb_store(shard_dir: str, db_path: str, map_size: int = 1 << 30) -> int:
    """Sequential append pass over the sorted runs (driver/single node —
    the same shape as the reference's writer).  Requires the ``lmdb``
    package; in environments without it (this one) the sorted-run layout
    and the class index above are the complete distributed product and
    this call raises."""
    try:
        import lmdb  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "write_lmdb_store needs the 'lmdb' package (not available in "
            "this environment); prepare_kv_dataset/class_index_batches "
            "produce the sorted runs + class index it would consume"
        ) from e

    import glob
    import zlib

    import pyarrow.parquet as pq

    env = lmdb.open(db_path, map_size=map_size, max_dbs=3)
    data_db = env.open_db(b"data", dupsort=False)
    idx_db = env.open_db(b"index", dupsort=True)
    n = 0
    with env.begin(write=True) as txn:
        batches: dict[bytes, list[bytes]] = {}
        for part in sorted(glob.glob(f"{shard_dir}/part-*")):
            table = pq.read_table(part, columns=["key_hex", "cls", "payload"])
            for key_hex, cls, payload in zip(*(c.to_pylist() for c in table.columns)):
                key = bytes.fromhex(key_hex.replace("-", ""))
                txn.put(
                    key=key,
                    value=zlib.compress(payload.encode("utf-8"), level=1),
                    db=data_db,
                    append=True,
                )
                b = batches.setdefault(cls.encode("utf-8"), [])
                b.append(key)
                if len(b) == IDX_BATCH:
                    txn.put(key=cls.encode("utf-8"), value=b"".join(b), db=idx_db)
                    b.clear()
                n += 1
        for cls_b, keys in batches.items():
            if keys:
                txn.put(key=cls_b, value=b"".join(keys), db=idx_db)
    env.sync()
    env.close()
    return n
