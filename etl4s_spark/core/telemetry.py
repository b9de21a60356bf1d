"""Telemetry facade (reference ``Tel``, src-3/Etl4s.scala:1543-1633 and
src/Telemetry.scala:18-76).

``Tel`` calls always record into the active Trace state (so ``run_trace``
reports them) and additionally forward to an installed provider. With no
provider they are near-zero-cost no-ops beyond the Trace append — parity
with the reference's "zero overhead without a provider" claim
(docs/tradeoffs.md:25).
"""

from __future__ import annotations

import contextvars
import time
import uuid
from typing import Any, Callable

from etl4s_spark.core.trace import TelSpan, current_trace

_provider: contextvars.ContextVar["TelemetryProvider | None"] = contextvars.ContextVar(
    "etl4s_tel_provider", default=None
)


class TelemetryProvider:
    """Interface mirroring the reference Etl4sTelemetry trait
    (src/Telemetry.scala:18-23)."""

    def on_span_start(self, span: TelSpan) -> None: ...

    def on_span_end(self, span: TelSpan) -> None: ...

    def on_counter(self, name: str, value: float, attrs: dict[str, Any]) -> None: ...

    def on_gauge(self, name: str, value: float, attrs: dict[str, Any]) -> None: ...

    def on_histogram(self, name: str, value: float, attrs: dict[str, Any]) -> None: ...


class ConsoleTelemetry(TelemetryProvider):
    """Console provider (reference src/Telemetry.scala:40-76)."""

    def __init__(self, emit: Callable[[str], None] = print) -> None:
        self.emit = emit

    def on_span_start(self, span: TelSpan) -> None:
        self.emit(f"[tel] span start {span.name} ({span.span_id})")

    def on_span_end(self, span: TelSpan) -> None:
        dur_ms = ((span.end_ns or span.start_ns) - span.start_ns) / 1e6
        self.emit(f"[tel] span end   {span.name} ({span.span_id}) {dur_ms:.1f}ms {span.status}")

    def on_counter(self, name: str, value: float, attrs: dict[str, Any]) -> None:
        self.emit(f"[tel] counter {name} += {value}")

    def on_gauge(self, name: str, value: float, attrs: dict[str, Any]) -> None:
        self.emit(f"[tel] gauge {name} = {value}")

    def on_histogram(self, name: str, value: float, attrs: dict[str, Any]) -> None:
        self.emit(f"[tel] histogram {name} << {value}")


class provider_scope:
    """Install a telemetry provider for a ``with`` block (reference
    withOtelSetup, src-3/Etl4s.scala:178-189)."""

    def __init__(self, provider: TelemetryProvider | None) -> None:
        self.provider = provider
        self._token: contextvars.Token | None = None

    def __enter__(self):
        self._token = _provider.set(self.provider)
        return self.provider

    def __exit__(self, *exc) -> None:
        if self._token is not None:
            _provider.reset(self._token)


class _SpanCtx:
    def __init__(self, name: str, attrs: dict[str, Any] | None) -> None:
        self.name = name
        self.attrs = attrs or {}
        self.span: TelSpan | None = None
        self._parent_id: str | None = None

    def __enter__(self) -> "TelSpan | None":
        st = current_trace()
        if st is None:
            return None
        self._parent_id = st.current_span_id
        self.span = TelSpan(
            name=self.name,
            span_id=uuid.uuid4().hex[:16],
            parent_span_id=self._parent_id,
            trace_id=st.trace_id,
            start_ns=time.time_ns(),
            attributes=dict(self.attrs),
        )
        st.current_span_id = self.span.span_id
        st.telemetry.spans.append(self.span)
        p = _provider.get()
        if p:
            p.on_span_start(self.span)
        return self.span

    def __exit__(self, exc_type, exc, tb) -> None:
        st = current_trace()
        if st is None or self.span is None:
            return
        self.span.end_ns = time.time_ns()
        if exc is not None:
            self.span.status = "ERROR"
            self.span.attributes["exception"] = repr(exc)
        st.current_span_id = self._parent_id
        p = _provider.get()
        if p:
            p.on_span_end(self.span)


class Tel:
    """Static facade — ``with Tel.span("stage"): ...``, ``Tel.add_counter``.

    Spans nest via the trace state's ``current_span_id`` (parent/child ids,
    reference src-3/Etl4s.scala:1561-1595).
    """

    @staticmethod
    def span(name: str, attrs: dict[str, Any] | None = None) -> _SpanCtx:
        return _SpanCtx(name, attrs)

    @staticmethod
    def add_counter(name: str, value: float = 1.0, attrs: dict[str, Any] | None = None) -> None:
        st = current_trace()
        if st is not None:
            st.telemetry.counters[name] = st.telemetry.counters.get(name, 0.0) + value
        p = _provider.get()
        if p:
            p.on_counter(name, value, attrs or {})

    @staticmethod
    def set_gauge(name: str, value: float, attrs: dict[str, Any] | None = None) -> None:
        st = current_trace()
        if st is not None:
            st.telemetry.gauges[name] = value
        p = _provider.get()
        if p:
            p.on_gauge(name, value, attrs or {})

    @staticmethod
    def record_histogram(name: str, value: float, attrs: dict[str, Any] | None = None) -> None:
        st = current_trace()
        if st is not None:
            st.telemetry.histograms.setdefault(name, []).append(value)
        p = _provider.get()
        if p:
            p.on_histogram(name, value, attrs or {})
