"""Event-time normalization for streaming operators.

Spark 4 infers ``TIMESTAMP_NTZ`` for parquet ``timestamp[us]`` columns with
no timezone annotation (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults true), but ``withWatermark`` requires ``TIMESTAMP`` (LTZ) —
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` otherwise. The reference's
TIMESTAMPTZ fields are ISO-8601 UTC instants
(milvus-bricks/milvus_client/common/data.py:189-191), i.e. LTZ semantics, so
the correct normalization is to interpret the naive value in the session
timezone (our sessions pin ``spark.sql.session.timeZone=UTC``,
session.py:27) by casting to TIMESTAMP.

Every streaming operator calls :func:`ensure_event_time_ltz` on its
event-time column before the watermark so any NTZ source works; the cast is
a no-op for columns already LTZ, keeping batch twins byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_event_time_ltz(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cast ``ts_col`` to TIMESTAMP (LTZ) iff it is TIMESTAMP_NTZ.

    The naive value is interpreted in the session timezone — with the
    engine's pinned UTC session this is microsecond-exact value-preserving.
    Columns already TimestampType (or anything castable upstream) pass
    through untouched so the shared batch/stream plan stays identical for
    LTZ sources.
    """
    field = df.schema[ts_col]
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
