"""In-flight run state: logs, errors, telemetry, wall time.

Parity with the reference's ``Trace`` ThreadLocal API
(/root/reference/etl4s/src-3/Etl4s.scala:1110-1368): downstream stages can
react to upstream state mid-run (``Trace.has_errors``), and
``run_trace`` returns a ``Trace(result, logs, time_elapsed_millis, errors,
telemetry)`` report.

Design fix over the reference: the reference stores state in a ThreadLocal,
so logs from concurrent ``&>`` branches land on pool threads and are lost
(SURVEY.md §3.1). Here state lives in a ``contextvars.ContextVar`` and
parallel fan-out copies the context into worker threads, so branch logs
land in the same collector.
"""

from __future__ import annotations

import contextvars
import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any


@dataclass
class TelSpan:
    name: str
    span_id: str
    parent_span_id: str | None
    trace_id: str
    start_ns: int
    end_ns: int | None = None
    attributes: dict[str, Any] = field(default_factory=dict)
    status: str = "OK"


@dataclass
class TelemetryData:
    counters: dict[str, float] = field(default_factory=dict)
    gauges: dict[str, float] = field(default_factory=dict)
    histograms: dict[str, list[float]] = field(default_factory=dict)
    spans: list[TelSpan] = field(default_factory=list)


@dataclass
class TraceState:
    """Mutable per-run collector (reference: the ThreadLocal tuple at
    src-3/Etl4s.scala:1184-1193)."""

    logs: list[str] = field(default_factory=list)
    errors: list[BaseException] = field(default_factory=list)
    start_time: float = field(default_factory=time.monotonic)
    telemetry: TelemetryData = field(default_factory=TelemetryData)
    current_span_id: str | None = None
    trace_id: str = field(default_factory=lambda: uuid.uuid4().hex[:16])


_state: contextvars.ContextVar[TraceState | None] = contextvars.ContextVar(
    "etl4s_trace_state", default=None
)


def current_trace() -> TraceState | None:
    return _state.get()


def _require_state() -> TraceState | None:
    return _state.get()


class Trace:
    """Static facade, mirroring reference ``Trace.log/error/...``."""

    @staticmethod
    def log(msg: str) -> None:
        st = _require_state()
        if st is not None:
            st.logs.append(str(msg))

    @staticmethod
    def error(msg_or_exc: str | BaseException) -> None:
        st = _require_state()
        if st is not None:
            exc = msg_or_exc if isinstance(msg_or_exc, BaseException) else RuntimeError(str(msg_or_exc))
            st.errors.append(exc)

    @staticmethod
    def logs() -> list[str]:
        st = _require_state()
        return list(st.logs) if st else []

    @staticmethod
    def errors() -> list[BaseException]:
        st = _require_state()
        return list(st.errors) if st else []

    @staticmethod
    def has_errors() -> bool:
        st = _require_state()
        return bool(st and st.errors)

    @staticmethod
    def elapsed_millis() -> float:
        st = _require_state()
        return (time.monotonic() - st.start_time) * 1000.0 if st else 0.0


class trace_scope:
    """Install a fresh TraceState for one run; restore the parent after
    (nesting support — reference withTraceSetup, src-3/Etl4s.scala:43-55)."""

    def __init__(self) -> None:
        self.state = TraceState()
        self._token: contextvars.Token | None = None

    def __enter__(self) -> TraceState:
        self._token = _state.set(self.state)
        return self.state

    def __exit__(self, *exc) -> None:
        if self._token is not None:
            _state.reset(self._token)


@dataclass
class TraceReport:
    """Result of ``run_trace`` (reference Trace case class,
    src-3/Etl4s.scala:1110-1144)."""

    result: Any
    logs: list[str]
    time_elapsed_millis: float
    errors: list[BaseException]
    telemetry: TelemetryData

    @property
    def has_errors(self) -> bool:
        return bool(self.errors)

    def to_otel_json(self, service_name: str = "etl4s_spark") -> str:
        """OTLP-shaped JSON export (reference src/Telemetry.scala:202-217)."""
        spans = [
            {
                "traceId": s.trace_id,
                "spanId": s.span_id,
                "parentSpanId": s.parent_span_id or "",
                "name": s.name,
                "startTimeUnixNano": str(s.start_ns),
                "endTimeUnixNano": str(s.end_ns or s.start_ns),
                "status": {"code": s.status},
                "attributes": [
                    {"key": k, "value": {"stringValue": str(v)}}
                    for k, v in s.attributes.items()
                ],
            }
            for s in self.telemetry.spans
        ]
        metrics: list[dict[str, Any]] = []
        for name, v in self.telemetry.counters.items():
            metrics.append({"name": name, "sum": {"dataPoints": [{"asDouble": v}], "isMonotonic": True}})
        for name, v in self.telemetry.gauges.items():
            metrics.append({"name": name, "gauge": {"dataPoints": [{"asDouble": v}]}})
        for name, vs in self.telemetry.histograms.items():
            metrics.append(
                {
                    "name": name,
                    "histogram": {
                        "dataPoints": [
                            {"count": len(vs), "sum": sum(vs), "min": min(vs), "max": max(vs)}
                        ]
                    },
                }
            )
        doc = {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": service_name}}
                        ]
                    },
                    "scopeSpans": [{"scope": {"name": "etl4s_spark"}, "spans": spans}],
                }
            ],
            "resourceMetrics": [
                {"scopeMetrics": [{"metrics": metrics}]}
            ],
        }
        return json.dumps(doc, indent=2)
