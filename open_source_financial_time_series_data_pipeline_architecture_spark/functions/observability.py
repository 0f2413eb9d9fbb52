"""Observability shims (V4 lineage, V5 tracing, G4 freshness hooks).

The reference wires OpenLineage + Marquez + OTel around every pipeline
step (/root/reference/src/observability/openlineage_tracker.py:35-234,
otel_instrumentation.py:23-208). For a Spark engine the production
answer is the OpenLineage Spark listener (pure config:
`spark.extraListeners=io.openlineage.spark.agent.OpenLineageSparkListener`)
— not engine code. What the engine itself provides is:

- a structured run-event recorder (append-only parquet, same shape as
  OpenLineage RunEvents) usable without any external service;
- a timing context manager for step-level spans.

Both are no-op-safe: if recording fails the pipeline proceeds.
"""

from __future__ import annotations

import datetime as _dt
import time
from contextlib import contextmanager

from pyspark.sql import SparkSession

RUN_EVENT_SCHEMA = (
    "event_time timestamp, job string, event_type string, "
    "inputs array<string>, outputs array<string>, duration_ms long"
)


class LineageRecorder:
    def __init__(self, spark: SparkSession, target_dir: str | None = None):
        self.spark = spark
        self.target_dir = target_dir
        self.events: list[tuple] = []

    def record(
        self,
        job: str,
        event_type: str,
        inputs: list[str] | None = None,
        outputs: list[str] | None = None,
        duration_ms: int | None = None,
    ) -> None:
        self.events.append(
            (
                _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
                job,
                event_type,
                inputs or [],
                outputs or [],
                duration_ms,
            )
        )

    @contextmanager
    def span(self, job: str, inputs: list[str] | None = None, outputs: list[str] | None = None):
        t0 = time.perf_counter()
        self.record(job, "START", inputs, outputs)
        try:
            yield
            self.record(
                job, "COMPLETE", inputs, outputs,
                int((time.perf_counter() - t0) * 1000),
            )
        except Exception:
            self.record(
                job, "FAIL", inputs, outputs,
                int((time.perf_counter() - t0) * 1000),
            )
            raise

    def flush(self) -> None:
        if not (self.target_dir and self.events):
            return
        try:
            self.spark.createDataFrame(self.events, RUN_EVENT_SCHEMA).write.mode(
                "append"
            ).parquet(self.target_dir)
            self.events = []
        except Exception:
            pass  # observability must never fail the pipeline
