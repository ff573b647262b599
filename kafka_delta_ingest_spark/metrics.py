"""Operational metrics emitter — the reference's IngestMetrics surface
(/root/reference/src/metrics.rs:24-301) with the SAME stat names, kinds,
and default prefix, over pluggable sinks:

- ``StatsdSink``: UDP datagrams ``<prefix>.<name>:<value>|c|ms|g`` —
  wire-compatible with the reference's statsd endpoint (metrics.rs:312-330,
  prefix from ``KDI_METRICS_PREFIX``, default ``kafka_delta_ingest``).
- ``JsonLinesSink``: one JSON object per stat to a file/stream — the
  no-infra default for this sandbox.
- ``InMemorySink``: capture for tests.

The reference records one stat per message; Spark processes batches, so
counter methods take an ``n`` increment — statsd counter semantics are
identical (the agent sums increments either way)."""

from __future__ import annotations

import json
import os
import socket
import sys
import time
from typing import IO

# counter / timer / gauge stat names, verbatim from the reference's
# StatType strum serializations (src/metrics.rs:223-301)
COUNTERS = {
    "messages.deserialization.completed",
    "messages.deserialization.failed",
    "messages.transform.completed",
    "messages.transform.failed",
    "recordbatch.started",
    "recordbatch.completed",
    "delta.write.started",
    "delta.write.completed",
    "delta.write.failed",
}
TIMERS = {
    "recordbatch.write_duration",
    "delta.write.duration",
}
GAUGES = {
    "buffered.record_batches",
    "messages.size",
    "delta.add.size",
    "buffer.lag.num_partitions",
    "buffer.lag.total",
    "buffer.lag.max",
    "buffer.lag.min",
    "delta.write.lag.num_partitions",
    "delta.write.lag.total",
    "delta.write.lag.max",
    "delta.write.lag.min",
}
ALL_STATS = COUNTERS | TIMERS | GAUGES

DEFAULT_PREFIX = os.environ.get("KDI_METRICS_PREFIX", "kafka_delta_ingest")


class InMemorySink:
    def __init__(self):
        self.records: list[tuple[str, str, int]] = []

    def emit(self, name: str, kind: str, value: int) -> None:
        self.records.append((name, kind, value))


class JsonLinesSink:
    def __init__(self, stream: IO | None = None, path: str | None = None):
        if path is not None:
            self._fh = open(path, "a")  # noqa: SIM115 — long-lived sink
        else:
            self._fh = stream or sys.stderr

    def emit(self, name: str, kind: str, value: int) -> None:
        self._fh.write(
            json.dumps({"ts": time.time(), "stat": name, "kind": kind, "value": value})
            + "\n"
        )
        self._fh.flush()


class StatsdSink:
    """Fire-and-forget UDP, like the reference's statsd client — metric
    loss under pressure is acceptable, blocking ingest is not."""

    def __init__(self, endpoint: str = "localhost:8125"):
        host, _, port = endpoint.partition(":")
        self._addr = (host or "localhost", int(port or 8125))
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setblocking(False)

    def emit(self, name: str, kind: str, value: int) -> None:
        wire_kind = {"counter": "c", "timer": "ms", "gauge": "g"}[kind]
        try:
            self._sock.sendto(f"{name}:{value}|{wire_kind}".encode(), self._addr)
        except OSError:
            pass  # never fail the pipeline on metrics


class IngestMetrics:
    """Mirrors the reference's recording methods (metrics.rs:37-138)."""

    def __init__(self, sink=None, prefix: str = DEFAULT_PREFIX):
        self.sink = sink or JsonLinesSink()
        self.prefix = prefix

    # ------------------------------------------------------------ plumbing
    def _rec(self, name: str, value: int) -> None:
        if name in TIMERS:
            kind = "timer"
        elif name in GAUGES:
            kind = "gauge"
        else:
            kind = "counter"
        self.sink.emit(f"{self.prefix}.{name}", kind, int(value))

    # ------------------------------------------------- reference methods
    def message_deserialized(self, n: int = 1):
        self._rec("messages.deserialization.completed", n)

    def message_deserialization_failed(self, n: int = 1):
        self._rec("messages.deserialization.failed", n)

    def message_deserialized_size(self, size: int):
        self._rec("messages.size", size)

    def message_transformed(self, n: int = 1):
        self._rec("messages.transform.completed", n)

    def message_transform_failed(self, n: int = 1):
        self._rec("messages.transform.failed", n)

    def batch_started(self):
        self._rec("recordbatch.started", 1)

    # timers are MILLISECONDS: the reference records elapsed().as_millis()
    # (metrics.rs:90-99) and statsd's |ms kind expects ms on the wire
    def batch_completed(self, buffered_record_batches: int, started_at: float):
        self._rec("recordbatch.write_duration", int((time.time() - started_at) * 1e3))
        self._rec("recordbatch.completed", 1)
        self._rec("buffered.record_batches", buffered_record_batches)

    def delta_write_started(self):
        self._rec("delta.write.started", 1)

    def delta_write_completed(self, started_at: float):
        self._rec("delta.write.completed", 1)
        self._rec("delta.write.duration", int((time.time() - started_at) * 1e3))

    def delta_write_failed(self):
        self._rec("delta.write.failed", 1)

    def delta_file_size(self, size: int):
        self._rec("delta.add.size", size)

    def buffer_lag(self, lags: list[int]):
        self._lag("buffer.lag", lags)

    def delta_lag(self, lags: list[int]):
        self._lag("delta.write.lag", lags)

    def _lag(self, base: str, lags: list[int]):
        self._rec(f"{base}.num_partitions", len(lags))
        self._rec(f"{base}.total", sum(lags))
        if lags:
            self._rec(f"{base}.max", max(lags))
            self._rec(f"{base}.min", min(lags))
