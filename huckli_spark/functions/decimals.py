"""Proto decimal parsing (reference S5).

``from_proto_decimal`` parses the proto's decimal-as-string and
silently defaults to 0.0 on absence or parse failure
(/root/reference/huckli-import/src/lib.rs:307-313).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def proto_decimal(col: Column) -> Column:
    return F.coalesce(col.try_cast("double"), F.lit(0.0))
