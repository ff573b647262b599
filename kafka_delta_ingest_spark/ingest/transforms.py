"""Per-message transforms — the reference's ``PROPERTY: SOURCE`` transform
map (/root/reference/src/transforms.rs:336-385) recast as a compiled
``withColumn`` chain.

SOURCE expressions supported (the surface the reference exposes):
- a dotted field path into the message (JMESPath's core accessor),
  e.g. ``meta.producer.timestamp``;
- well-known meta attributes ``kafka.partition | kafka.offset |
  kafka.topic | kafka.timestamp`` (transforms.rs:399-434) — here they read
  the engine's lineage columns (``_partition``, ``_offset``, ``_topic``,
  ``_ts``), the batch analogue of consumer metadata;
- custom scalar fns ``substr(path, skip, take)`` (0-based char semantics,
  transforms.rs:141-153) and ``epoch_seconds_to_iso8601(path)`` /
  ``epoch_micros_to_iso8601(path)`` (transforms.rs:179-192);
- any other expression falls through to Spark SQL ``F.expr`` (the
  JMESPath-built-ins analogue, transforms.rs:70-85 — Catalyst's expression
  language is our registered runtime).

PROPERTY may be a nested dotted path; nested assignment uses
``withField`` (the set_value analogue, transforms.rs:301-329). A SOURCE
evaluating to null leaves the property untouched for that row when the
target already exists (null-is-noop, transforms.rs:301-305), else sets
null."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.functions.scalars import (
    epoch_micros_to_iso8601,
    epoch_seconds_to_iso8601,
    substr0,
)

_KAFKA_META = {
    "kafka.partition": "_partition",
    "kafka.offset": "_offset",
    "kafka.topic": "_topic",
    "kafka.timestamp": "_ts",
    "kafka.timestamp_type": "_ts_type",
}

_FN_RE = re.compile(r"^(\w+)\((.*)\)$")


class Transformer:
    """Compile once, apply to any DataFrame — mirroring the reference's
    precompiled ``Vec<(ValuePath, MessageTransform)>``
    (transforms.rs:87-114)."""

    def __init__(self, transforms: dict[str, str]):
        self.transforms = dict(transforms)

    def _source_col(self, df: DataFrame, src: str) -> Column:
        src = src.strip()
        if src in _KAFKA_META:
            meta_col = _KAFKA_META[src]
            return F.col(meta_col) if meta_col in df.columns else F.lit(None)
        m = _FN_RE.match(src)
        if m:
            fn, argstr = m.group(1), m.group(2)
            args = [a.strip() for a in argstr.split(",")] if argstr.strip() else []
            if fn == "substr":
                return substr0(self._source_col(df, args[0]), int(args[1]), int(args[2]))
            if fn == "epoch_seconds_to_iso8601":
                return epoch_seconds_to_iso8601(self._source_col(df, args[0]))
            if fn == "epoch_micros_to_iso8601":
                return epoch_micros_to_iso8601(self._source_col(df, args[0]))
            return F.expr(src)  # any Spark SQL function
        if re.fullmatch(r"[A-Za-z_][\w.]*", src):
            return F.col(src)  # dotted path accessor
        return F.expr(src)

    def apply(self, df: DataFrame) -> DataFrame:
        for prop, src in self.transforms.items():
            val = self._source_col(df, src)
            if "." in prop:
                head, rest = prop.split(".", 1)
                if head not in df.columns:
                    raise ValueError(
                        f"nested transform target {prop!r}: column {head!r} missing"
                    )
                df = df.withColumn(head, F.col(head).withField(rest, val))
            else:
                if prop in df.columns:
                    # null-is-noop on existing properties (transforms.rs:301-305)
                    df = df.withColumn(prop, F.coalesce(val, F.col(prop)))
                else:
                    df = df.withColumn(prop, val)
        return df
