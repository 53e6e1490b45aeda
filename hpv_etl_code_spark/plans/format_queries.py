"""Source/sink format round-trip certificates (round 5, session 3):
write the events fact out as JSON lines / ORC / CSV, read it back, and
aggregate a fidelity certificate that the DuckDB oracle computes from
the ORIGINAL parquet — so a driver hash match certifies the entire
write→read path byte-for-byte at the value level.

The certificate per event_type: row count, distinct users, exact cents
sum, min/max timestamp in MICROSECONDS, and a checksum — the BIGINT sum
of a 40-bit md5 prefix over the canonical row string
``event_id|ts_us|user_id|event_type|cents|props``. Any field any codec
mangles (timestamp truncation, float formatting, quote/escape damage,
null confusion) shifts the checksum and the gate goes red.

Known sharp edge encoded here: Spark's default JSON/CSV timestamp
format truncates to MILLISECONDS — a silent 3-digit data loss on
microsecond timestamps. Both writers and readers pin
``yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX``.

Reference parity: the reference reads .xlsx and writes a database sink
(src/main.py:1-141, src/utils/database_util.py:10-62 — covered by
``sources/sheets.py`` + ``sources/sinks.py``); these entries extend the
format surface to the interchange formats a 100 TB lakehouse actually
ingests (JSONL logs, ORC warehouse extracts, CSV drops), where the scan
parallelism story is per-file splits of the same DataFrame source API.

Scale: the write is a one-off partitioned export (split across
executors, no single-writer bottleneck); the certificate is ONE hash
aggregation with map-side partials. The 40-bit checksum keeps the
per-group sum inside BIGINT up to ~10^7 rows per group at test scales;
a 100 TB deployment widens it to DECIMAL(38,0) (noted, not needed at
the driver's sf).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _scratch(sf_dir: str, fmt: str) -> str:
    """Deterministic per-dataset scratch dir (overwrite-idempotent),
    same convention as the persisted ANN index artifacts
    (``plans/vector_queries._index_scratch``)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_rt_{fmt}_{tag}")


def _certificate(back: DataFrame) -> DataFrame:
    """Fidelity certificate over a re-read events frame (see module
    docstring). All aggregates are exact-integer — no float seam."""
    ev = back.select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "event_id",
        "props",
    )
    sig = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("ts_us").cast("string"),
                    F.col("user_id").cast("string"),
                    F.col("event_type"),
                    F.col("cents").cast("string"),
                    F.col("props"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("ts_us").cast("bigint").alias("min_ts_us"),
        F.max("ts_us").cast("bigint").alias("max_ts_us"),
        F.sum(sig).cast("bigint").alias("sig_sum"),
    )


def roundtrip_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines → events, certified against parquet."""
    ev = load_table(spark, sf_dir, "events")
    path = _scratch(sf_dir, "json")
    ev.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)
    back = (
        spark.read.schema(ev.schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )
    return _certificate(back)


def roundtrip_orc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → events, certified against parquet. ORC is typed
    (timestamps carry nanos natively) so no format pins are needed."""
    ev = load_table(spark, sf_dir, "events")
    path = _scratch(sf_dir, "orc")
    ev.write.mode("overwrite").orc(path)
    return _certificate(spark.read.orc(path))


def roundtrip_csv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV → events, certified against parquet. Exercises the
    quoting/escaping path (props holds JSON with quotes and braces) and
    shortest-repr double round-tripping, plus the microsecond pin."""
    ev = load_table(spark, sf_dir, "events")
    path = _scratch(sf_dir, "csv")
    (
        ev.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )
    back = (
        spark.read.schema(ev.schema)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )
    return _certificate(back)


_CERT_SQL = """
WITH ev AS (
  SELECT event_type, user_id, event_id, props,
         epoch_us(ts)::BIGINT AS ts_us,
         (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS cents
  FROM events
), s AS (
  SELECT event_type, user_id, ts_us, cents,
    ('0x' || substr(md5(event_id::VARCHAR || '|' || ts_us::VARCHAR || '|'
       || user_id::VARCHAR || '|' || event_type || '|'
       || cents::VARCHAR || '|' || props), 1, 10))::BIGINT AS sig
  FROM ev
)
SELECT event_type, COUNT(*)::BIGINT AS n_events,
       COUNT(DISTINCT user_id)::BIGINT AS n_users,
       SUM(cents)::BIGINT AS sum_cents,
       MIN(ts_us)::BIGINT AS min_ts_us,
       MAX(ts_us)::BIGINT AS max_ts_us,
       SUM(sig)::BIGINT AS sig_sum
FROM s GROUP BY 1
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    # All three share the parquet-side certificate oracle: a hash match
    # means the write→read path preserved every certified field.
    register("roundtrip_json_events", roundtrip_json_events, _CERT_SQL)
    register("roundtrip_orc_events", roundtrip_orc_events, _CERT_SQL)
    register("roundtrip_csv_events", roundtrip_csv_events, _CERT_SQL)
