"""Temporal expressions.

The reference encodes timestamps as int epoch units plus calendar fields on a
``Timestamp`` node (cognee/modules/engine/models/Timestamp.py; date_to_int in
the kuzu adapter), then range-filters with
``json_extract(properties,'$.time_at') BETWEEN a AND b`` (adapter.py:1802-1881).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_to_int(ts: Column | str) -> Column:
    """timestamp → epoch seconds as bigint (the reference's time_at encoding)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_timestamp(c).cast("bigint")


def calendar_fields(ts: Column | str) -> dict[str, Column]:
    """year..second calendar decomposition (Timestamp model fields)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
        "minute": F.minute(c),
        "second": F.second(c).cast("int"),
    }
