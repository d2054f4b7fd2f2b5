"""WOF gazetteer SQLite source (S13): the dump-as-cache passthrough.

Restates sources/general/wof/fetcher.py:1-57 in /root/reference: the 33GB
Who's-On-First SQLite dump is used directly as the record cache — point
lookups go ``SELECT body FROM geojson WHERE id=?`` and fall through to the
data.whosonfirst.org HTTP scheme (ids chunked into path segments of three
digits) when the dump misses.

Spark form: stdlib ``sqlite3`` (no JDBC needed), two access paths:

- **bulk scan** (``load_sqlite_table``): rowid-range partitioned
  ``mapInPandas`` — the driver reads min/max rowid only; each task opens
  its own read-only connection and scans one range, so a 33GB dump loads
  as N parallel range scans.  At cluster scale the dump sits on shared
  storage (the same place the parquet lives); in local mode any path
  works.
- **point lookup** (``wof_fetch_factory``): a fetch factory for the S1
  distributed fetcher — dump hit first, injectable HTTP fallback second,
  mirroring the reference's fetch().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def make_fetch_uri(identifier: str) -> str:
    """The WOF HTTP scheme (fetcher.py:16-31): path = id chunked by 3.
    ``85633793`` -> ``https://data.whosonfirst.org/856/337/93/85633793.geojson``."""
    identifier = identifier.replace(".geojson", "")
    if "/" in identifier:
        return f"https://data.whosonfirst.org/{identifier}.geojson"
    chunks = []
    npid = identifier
    while npid:
        chunks.append(npid[:3])
        npid = npid[3:]
    return f"https://data.whosonfirst.org/{'/'.join(chunks)}/{identifier}.geojson"


def load_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str = "geojson",
    columns: tuple[str, ...] = ("id", "body"),
    n_partitions: int = 8,
) -> DataFrame:
    """Distributed scan of a SQLite table: split by rowid range, one
    read-only connection per task.  Returns string columns (SQLite is
    dynamically typed; parse downstream with from_json like any dump)."""
    import sqlite3

    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        row = conn.execute(f"SELECT MIN(rowid), MAX(rowid) FROM {table}").fetchone()
    lo, hi = row or (None, None)
    schema = ", ".join(f"{c} string" for c in columns)
    if lo is None:
        return spark.createDataFrame([], schema)

    span = hi - lo + 1
    step = max(1, span // n_partitions + (1 if span % n_partitions else 0))
    bounds = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
              for i in range(n_partitions) if lo + i * step <= hi]
    col_sql = ", ".join(columns)

    def scan(iterator):
        import pandas as pd

        conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            for pdf in iterator:
                for a, b in pdf.itertuples(index=False):
                    out = pd.read_sql_query(
                        f"SELECT {col_sql} FROM {table}"
                        " WHERE rowid BETWEEN ? AND ?",
                        conn, params=(int(a), int(b)),
                    )
                    if len(out):
                        # SQLite is dynamically typed: emit strings,
                        # NULLs preserved (vectorized astype, not a
                        # per-value Python loop)
                        for c in out.columns:
                            mask = out[c].notna()
                            out[c] = out[c].astype(str).where(mask, None)
                        yield out
        finally:
            conn.close()

    # one range per partition, deterministically: repartition(n) round-
    # robins and can pack two ranges in one task while another sits idle
    ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(bounds, len(bounds)), "lo long, hi long"
    )
    return ranges.mapInPandas(scan, schema)


def wof_fetch_factory(db_path: str, http_fetch_factory=None):
    """Fetch factory for sources/fetcher.fetch_records: dump point-lookup
    first (fetcher.py:33-53), HTTP scheme fallback when the id is absent
    or the dump is missing.  ``http_fetch_factory`` (optional) builds the
    network fetch; without one, misses return None (offline mode)."""
    import os

    def factory():
        import sqlite3

        conn = None
        if os.path.exists(db_path):
            # the S1 fetcher calls fetch() from a small thread pool;
            # sqlite3's serialized threading mode makes one read-only
            # connection safe to share, but the same-thread check must be
            # relaxed since the connection is built on the task thread
            conn = sqlite3.connect(
                f"file:{db_path}?mode=ro", uri=True, check_same_thread=False
            )
        http_fetch = http_fetch_factory() if http_fetch_factory else None

        def fetch(identifier: str):
            ident = identifier.rsplit("/", 1)[-1].replace(".geojson", "")
            if conn is not None:
                row = conn.execute(
                    "SELECT body FROM geojson WHERE id=?", (ident,)
                ).fetchone()
                if row is not None:
                    return row[0]
            if http_fetch is not None:
                return http_fetch(make_fetch_uri(ident))
            return None

        return fetch

    return factory


CONFIG = {
    "name": "wof",
    "loader": f"{__name__}:load_sqlite_table",
    "merge_order": 8,
}
