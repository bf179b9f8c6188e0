"""IpAddr fast-field support.

The reference stores IP addresses as u128 fast-field values, mapping IPv4
into IPv6 space (`FieldType::IpAddr`, src/schema/field_type.rs:177-201:
`Ipv4Addr::to_ipv6_mapped`), and serves range queries over the numeric
order (range_query_fastfield.rs).

Spark has no u128 column type, so we normalize to a 32-hex-digit
lowercase string: lexicographic order over the fixed-width hex equals
numeric order over the u128, which makes the existing string-typed
RangeQuery fast-field scan (operators/search.py) correct as-is — the
same order-preserving-encoding trick the term dictionary uses for
numeric terms (src/termdict/mod.rs:10-17).
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from tantivy_spark.plans import logical as L


def ip_to_u128_hex(ip: str) -> str:
    """Normalize one IPv4/IPv6 string to its 32-hex-digit u128 form
    (IPv4 via the ::ffff:a.b.c.d mapped block, field_type.rs:186-194)."""
    addr = ipaddress.ip_address(ip)
    if addr.version == 4:
        value = int(ipaddress.IPv6Address(f"::ffff:{addr}"))
    else:
        value = int(addr)
    return f"{value:032x}"


@pandas_udf(StringType())
def _ip_hex_udf(s: pd.Series) -> pd.Series:
    # Arrow-batched; dedupe within the batch so hot values parse once
    uniq = {v: (ip_to_u128_hex(v) if v is not None else None)
            for v in s.unique()}
    return s.map(uniq)


def ip_hex_col(col: str | Column) -> Column:
    """Column expression normalizing an IP-string column for indexing as
    a fast field (use at ingestion: `df.withColumn("ip", ip_hex_col("ip"))`)."""
    return _ip_hex_udf(F.col(col) if isinstance(col, str) else col)


def ip_range(field: str, lower: str | None = None, upper: str | None = None,
             lower_inclusive: bool = True,
             upper_inclusive: bool = True) -> L.RangeQuery:
    """RangeQuery over an ip fast field with human-readable bounds
    (the reference's `RangeQuery` over an ip_addr field,
    range_query.rs:71 + range_query_fastfield.rs ip specialization)."""
    return L.RangeQuery(
        field,
        lower=None if lower is None else ip_to_u128_hex(lower),
        upper=None if upper is None else ip_to_u128_hex(upper),
        lower_inclusive=lower_inclusive,
        upper_inclusive=upper_inclusive,
    )
