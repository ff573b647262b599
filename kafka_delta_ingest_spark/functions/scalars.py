"""Scalar functions mirroring the reference's custom JMESPath functions
(/root/reference/src/transforms.rs:141-247), expressed as Catalyst column
expressions (JVM-side, codegen'd — no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_SECONDS = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # ref transforms.rs:188 ("%Y-%m-%dT%H:%M:%SZ")


def substr0(col: Column | str, skip: int, take: int) -> Column:
    """Char-based substring with the reference's 0-based skip/take semantics
    (ref substr, transforms.rs:141-153,194-213). Spark's substring is
    1-based, hence the +1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, skip + 1, take)


def epoch_seconds_to_iso8601(col: Column | str) -> Column:
    """i64 epoch seconds → "2021-07-20T23:18:18Z" (ref transforms.rs:179-185)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_timestamp(c.cast("long")), ISO_SECONDS)


def epoch_micros_to_iso8601(col: Column | str) -> Column:
    """i64 epoch micros → ISO string (ref transforms.rs:187-192: divides by
    1_000_000 keeping micro remainder; seconds precision in output)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.timestamp_micros(c.cast("long")), ISO_SECONDS)


def token_checksum(tokens: Column | str) -> Column:
    """Order-sensitive checksum of an int array, computed JVM-side:
    sum((i+1) * tokens[i]). Used by the token-array-equality invariant —
    a reordering or element change moves the sum. Also expressible in
    ANSI SQL for the DuckDB oracle."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    zipped = F.zip_with(
        c.cast("array<long>"),
        F.sequence(F.lit(1), F.coalesce(F.size(c), F.lit(0))).cast("array<long>"),
        lambda t, i: t * i,
    )
    return F.coalesce(
        F.aggregate(zipped, F.lit(0).cast("long"), lambda acc, x: acc + x),
        F.lit(0).cast("long"),
    )
