"""The pipeline algebra: a lazy, composable function wrapper.

Parity map to the reference combinators (SURVEY.md §2.A; citations are
/root/reference/etl4s/src-3/Etl4s.scala unless noted):

==========================  =========================================  ==============
reference                   here                                       citation
==========================  =========================================  ==============
``Node[A,B]`` (lazy A=>B)   ``Node(f)`` — runs only on ``run()``       :34-40
``Extract/Transform/...``   type aliases (intent-only, same class)     :688-691
``~>`` / ``andThen``        ``>>`` / ``.then()``                       :343-357
``&`` (fan-out, seq)        ``&`` / ``.fanout()`` (auto-flatten)       :440-451,1433
``&>`` (fan-out, conc)      ``.par()`` / ``parallel(...)``             :489-503
``>>`` (effect sequence)    ``.seq()`` (same input to both, keep rhs)  :395-407
``map`` / ``flatMap``       ``.map()`` / ``.flat_map()``               :305,321-324
``tap``                     ``.tap()``                                 :537-541
``onFailure``               ``.on_failure(handler)``                   :559-566
``withRetry``               ``.with_retry(...)``                       :584-600
``runAsync``                ``.run_async()``                           :615
``zip``                     ``.zip()`` (flatten nested tuples)         :638-639,1386
``If/ElseIf/Else``          ``branch().when(...).otherwise(...)``      :1952-2038
``ensure*``                 ``.ensure()/.ensure_warn()`` (+ _par)      :1859-1947
``requires``/``provide``    ``Node.requires(fn)`` → ``Reader``         :212-218,834
``unsafeRun/safeRun``       ``.run()`` / ``.run_safe()``               :87-125
``unsafeRunTrace``          ``.run_trace()`` / ``.run_safe_trace()``   :134-175
``withMetadata``            ``.with_metadata()``                       :232-240
``.lineage(...)``           ``.with_lineage(...)``                     :1746-1761
==========================  =========================================  ==============

Design notes:

- Composition is closure fusion exactly like the reference — the "IR" is
  the callable tree. When the payload values are Spark DataFrames, every
  stage merely extends a logical plan; Catalyst sees the WHOLE fused plan
  at the terminal action, so cross-stage optimization (pushdown through
  pipeline stages, join reordering) is free. This is the key reason the
  Spark-first design beats a stage-materializing translation.
- ``.par`` fan-out uses a thread pool and copies ``contextvars`` context so
  Trace/Tel state propagates into branches (fixes the reference's
  ThreadLocal-loss hazard, SURVEY.md §3.1). For Spark payloads, ``&`` is
  normally right — Spark parallelizes the DAG itself — and ``.par`` only
  pays off for concurrent *actions* (e.g. two writes), matching the
  reference's own guidance (docs/examples-spark.md:100-101).
"""

from __future__ import annotations

import time
from concurrent.futures import Future, ThreadPoolExecutor
from contextvars import copy_context
from dataclasses import dataclass
from typing import Any, Callable, Generic, TypeVar

from etl4s_spark.core.lineage import Lineage
from etl4s_spark.core.trace import Trace, TraceReport, trace_scope
from etl4s_spark.core.validation import Check, ValidationException, run_checks

A = TypeVar("A")
B = TypeVar("B")
C = TypeVar("C")


@dataclass
class Result(Generic[B]):
    """Try-like result for ``run_safe`` (reference safeRun → Try[B])."""

    value: B | None
    error: BaseException | None = None

    @property
    def ok(self) -> bool:
        return self.error is None

    def get(self) -> B:
        if self.error is not None:
            raise self.error
        return self.value  # type: ignore[return-value]

    def get_or_else(self, default: B) -> B:
        return default if self.error is not None else self.value  # type: ignore[return-value]


def _normalize_checks(checks) -> list[Check]:
    out: list[Check] = []
    if checks is None:
        return out
    if not isinstance(checks, (list, tuple)):
        checks = [checks]
    for i, c in enumerate(checks):
        if isinstance(c, Check):
            out.append(c)
        else:
            out.append(Check.of(getattr(c, "__name__", f"check_{i}"), c))
    return out


class Node(Generic[A, B]):
    """A lazy, composable ``A -> B``. Nothing runs until ``run()``."""

    __slots__ = ("f", "name", "metadata", "_lineage", "_fanout_arity")

    def __init__(
        self,
        f: Callable[..., B],
        name: str | None = None,
        metadata: Any = None,
        lineage: Lineage | None = None,
        _fanout_arity: int = 0,
    ) -> None:
        self.f = f
        self.name = name or getattr(f, "__name__", "node")
        self.metadata = metadata
        self._lineage = lineage
        self._fanout_arity = _fanout_arity  # >0 → output is a flattened tuple

    # -- execution ----------------------------------------------------------

    def __call__(self, a: A = None) -> B:  # type: ignore[assignment]
        return self.f(a)

    def run(self, a: A = None) -> B:  # type: ignore[assignment]
        """Execute synchronously (reference unsafeRun, :99-104)."""
        with trace_scope():
            return self.f(a)

    unsafe_run = run

    def run_safe(self, a: A = None) -> Result[B]:  # type: ignore[assignment]
        """Execute, capturing any exception (reference safeRun, :110-125)."""
        try:
            return Result(self.run(a))
        except BaseException as e:  # noqa: BLE001 — parity: catches Throwable
            return Result(None, e)

    def run_trace(self, a: A = None) -> TraceReport:  # type: ignore[assignment]
        """Execute and return the full run report (reference unsafeRunTrace,
        :134-150). Raises on failure, like the reference."""
        with trace_scope() as st:
            t0 = time.monotonic()
            result = self.f(a)
            elapsed = (time.monotonic() - t0) * 1000.0
            return TraceReport(result, list(st.logs), elapsed, list(st.errors), st.telemetry)

    def run_safe_trace(self, a: A = None) -> TraceReport:  # type: ignore[assignment]
        """Like ``run_trace`` but captures the exception in the report
        (reference safeRunTrace, :152-175)."""
        with trace_scope() as st:
            t0 = time.monotonic()
            result: Any = None
            try:
                result = self.f(a)
            except BaseException as e:  # noqa: BLE001
                st.errors.append(e)
            elapsed = (time.monotonic() - t0) * 1000.0
            return TraceReport(result, list(st.logs), elapsed, list(st.errors), st.telemetry)

    def run_async(self, a: A = None, executor: ThreadPoolExecutor | None = None) -> Future:  # type: ignore[assignment]
        """Execute on a worker thread, returning a Future (reference
        runAsync, :615)."""
        ex = executor or _default_executor()
        ctx = copy_context()
        return ex.submit(ctx.run, self.run, a)

    # -- composition --------------------------------------------------------

    def then(self, other: "Node[B, C] | Callable[[B], C]") -> "Node[A, C]":
        """Sequential composition ``self ~> other`` (reference :343-352).
        Chaining into a Reader lifts this node into Reader-land
        (reference Node~>Reader, :367-376)."""
        r = _as_reader(other)
        if r is not None:
            from etl4s_spark.core.reader import Reader

            return Reader(lambda cfg: self.then(r.run(cfg)))  # type: ignore[return-value]
        other = node(other)
        ln = _chain_lineage(self._lineage, other._lineage)
        return Node(lambda a: other.f(self.f(a)), name=f"{self.name}>>{other.name}", lineage=ln)

    def __rshift__(self, other) -> "Node[A, C]":
        return self.then(other)

    def __rrshift__(self, other) -> "Node":
        return node(other).then(self)

    def seq(self, other: "Node[A, C] | Callable[[A], C]") -> "Node[A, C]":
        """Reference ``>>``: run self for side effects, feed the SAME input
        to other, keep other's result (:395-407)."""
        other = node(other)

        def run(a: A) -> C:
            self.f(a)
            return other.f(a)

        return Node(run, name=f"{self.name};{other.name}")

    def fanout(self, *others: "Node | Callable") -> "Node":
        """Sequential fan-out ``&``: run all on the same input, return a
        flat tuple (reference :440-451 + TupleAppend auto-flatten
        :1433-1456)."""
        if any(_as_reader(o) is not None for o in others):
            from etl4s_spark.core.reader import Reader, _lift

            readers = [_lift(o) for o in others]
            return Reader(lambda cfg: self.fanout(*(r.run(cfg) for r in readers)))  # type: ignore[return-value]
        nodes = [node(o) for o in others]
        arity = (self._fanout_arity or 1) + len(nodes)
        ln = self._lineage
        for n in nodes:
            ln = _combine_lineage(ln, n._lineage)

        def run(a: A) -> tuple:
            left = self.f(a)
            head = left if self._fanout_arity else (left,)
            return (*head, *(n.f(a) for n in nodes))

        return Node(run, name=f"({self.name}&...)", lineage=ln, _fanout_arity=arity)

    def __and__(self, other) -> "Node":
        return self.fanout(other)

    def par(self, *others: "Node | Callable") -> "Node":
        """Concurrent fan-out ``&>``: branches run on a thread pool
        (reference :489-503, Platform.runParallel src-jvm/Platform.scala:10-14).
        Context (Trace/Tel state) is copied into branches so logs are not
        lost — a deliberate fix over the reference (SURVEY.md §3.1)."""
        nodes = [node(o) for o in others]
        arity = (self._fanout_arity or 1) + len(nodes)

        def run(a: A) -> tuple:
            all_nodes = [self, *nodes]
            with ThreadPoolExecutor(max_workers=len(all_nodes)) as ex:
                # one context copy PER branch — a Context can only be entered
                # once; the copies share the same mutable TraceState object,
                # so branch logs still land in the parent collector
                futures = [ex.submit(copy_context().run, n.f, a) for n in all_nodes]
                results = [f.result() for f in futures]
            head = results[0] if self._fanout_arity else (results[0],)
            return (*head, *results[1:])

        return Node(run, name=f"({self.name}&>...)", _fanout_arity=arity)

    def zip(self) -> "Node[A, tuple]":
        """Flatten nested tuple output (reference zip + Flatten type class,
        :638-639, 1386-1421)."""

        def flatten(x):
            if isinstance(x, tuple):
                out = []
                for item in x:
                    out.extend(flatten(item) if isinstance(item, tuple) else [item])
                return tuple(out)
            return (x,)

        return Node(lambda a: flatten(self.f(a)), name=f"{self.name}.zip")

    def map(self, fn: Callable[[B], C]) -> "Node[A, C]":
        """Post-transform the output (reference :305)."""
        return Node(lambda a: fn(self.f(a)), name=f"{self.name}.map", lineage=self._lineage)

    def flat_map(self, fn: Callable[[B], "Node[A, C]"]) -> "Node[A, C]":
        """Data-dependent next-node selection (reference :321-324): the
        intermediate value picks the next Node, which re-reads the ORIGINAL
        input."""

        def run(a: A) -> C:
            b = self.f(a)
            return node(fn(b)).f(a)

        return Node(run, name=f"{self.name}.flat_map")

    def tap(self, fn: Callable[[B], Any]) -> "Node[A, B]":
        """Peek at the output, pass it through unchanged (reference
        :537-541). For DataFrames prefer ``df.observe`` to avoid extra jobs."""

        def run(a: A) -> B:
            b = self.f(a)
            fn(b)
            return b

        return Node(run, name=f"{self.name}.tap", lineage=self._lineage)

    # -- resilience ---------------------------------------------------------

    def on_failure(self, handler: Callable[[BaseException], B]) -> "Node[A, B]":
        """Catch any exception from this node, return the fallback
        (reference :559-566)."""

        def run(a: A) -> B:
            try:
                return self.f(a)
            except BaseException as e:  # noqa: BLE001 — parity: Throwable
                return handler(e)

        return Node(run, name=f"{self.name}.on_failure", lineage=self._lineage)

    def with_retry(
        self,
        max_attempts: int = 3,
        initial_delay_ms: float = 100.0,
        backoff_factor: float = 2.0,
    ) -> "Node[A, B]":
        """Retry with exponential backoff; defaults match the reference
        (:584-587). For Spark writes, pair with idempotent output modes
        (overwrite / transactional committers)."""

        def run(a: A) -> B:
            delay = initial_delay_ms
            last: BaseException | None = None
            for attempt in range(max_attempts):
                try:
                    return self.f(a)
                except BaseException as e:  # noqa: BLE001
                    last = e
                    Trace.log(f"retry {self.name}: attempt {attempt + 1} failed: {e}")
                    if attempt < max_attempts - 1:
                        time.sleep(delay / 1000.0)
                        delay *= backoff_factor
            raise last  # type: ignore[misc]

        return Node(run, name=f"{self.name}.retry", lineage=self._lineage)

    # -- validation ---------------------------------------------------------

    def ensure(
        self,
        input: Any = None,
        output: Any = None,
        change: Callable[[A, B], Any] | None = None,
        parallel: bool = False,
    ) -> "Node[A, B]":
        """Input/output/change validation; collects ALL failures, logs them
        to Trace, raises ValidationException (reference :1859-1900).
        ``parallel=True`` = ensurePar."""
        in_checks = _normalize_checks(input)
        out_checks = _normalize_checks(output)

        def run(a: A) -> B:
            failures = run_checks(a, in_checks, parallel)
            if failures:
                for m in failures:
                    Trace.error(ValidationException([m]))
                raise ValidationException(failures)
            b = self.f(a)
            failures = run_checks(b, out_checks, parallel)
            if change is not None:
                r = change(a, b)
                if r is False:
                    failures.append("change check failed")
                elif isinstance(r, str):
                    failures.append(r)
            if failures:
                for m in failures:
                    Trace.error(ValidationException([m]))
                raise ValidationException(failures)
            return b

        return Node(run, name=f"{self.name}.ensure", lineage=self._lineage)

    def ensure_warn(
        self,
        input: Any = None,
        output: Any = None,
        parallel: bool = False,
    ) -> "Node[A, B]":
        """Like ``ensure`` but logs warnings instead of raising
        (reference :1905-1947)."""
        in_checks = _normalize_checks(input)
        out_checks = _normalize_checks(output)

        def run(a: A) -> B:
            for m in run_checks(a, in_checks, parallel):
                Trace.log(f"WARN {m}")
            b = self.f(a)
            for m in run_checks(b, out_checks, parallel):
                Trace.log(f"WARN {m}")
            return b

        return Node(run, name=f"{self.name}.ensure_warn", lineage=self._lineage)

    # -- config injection ---------------------------------------------------

    @staticmethod
    def requires(factory: Callable[[Any], "Node[A, B]"]) -> "Reader":
        """Lift a config-dependent node factory into a Reader
        (reference .requires, :212-218)."""
        from etl4s_spark.core.reader import Reader

        return Reader(lambda cfg: node(factory(cfg)))

    # -- metadata / lineage --------------------------------------------------

    def with_metadata(self, metadata: Any) -> "Node[A, B]":
        n = Node(self.f, name=self.name, metadata=metadata, lineage=self._lineage,
                 _fanout_arity=self._fanout_arity)
        return n

    def with_lineage(self, name: str = "", **kwargs) -> "Node[A, B]":
        """Attach lineage metadata (reference .lineage, :1746-1761).
        kwargs: inputs, outputs, upstreams, schedule, cluster, description,
        group, tags, links."""
        for key in ("inputs", "outputs", "upstreams", "tags", "links"):
            if key in kwargs and not isinstance(kwargs[key], tuple):
                kwargs[key] = tuple(kwargs[key])
        ln = Lineage(name=name or self.name, **kwargs)
        return Node(self.f, name=self.name, metadata=self.metadata, lineage=ln,
                    _fanout_arity=self._fanout_arity)

    @property
    def lineage(self) -> Lineage | None:
        return self._lineage

    def __repr__(self) -> str:
        return f"Node({self.name})"


# Semantic aliases — identical types, intent-only naming (reference :688-691)
Extract = Node
Transform = Node
Load = Node
Pipeline = Node


def node(x: "Node | Callable") -> Node:
    """Coerce a plain callable to a Node (reference implicit
    function1ToNode, :1163)."""
    if isinstance(x, Node):
        return x
    if callable(x):
        return Node(x)
    raise TypeError(f"cannot convert {type(x).__name__} to Node")


def identity() -> Node:
    return Node(lambda a: a, name="identity")


def pure(value: Any) -> Node:
    """Constant node ignoring its input (reference Node.pure / lazy value
    constructor, :671-676). The value factory is evaluated per run if
    callable — laziness parity (docs/effect.md:63-66)."""
    if callable(value):
        return Node(lambda _a=None: value(), name="pure")
    return Node(lambda _a=None: value, name="pure")


def parallel(*nodes: "Node | Callable") -> Node:
    """Concurrent fan-out over the same input (reference ``&>`` /
    Platform.runParallel)."""
    ns = [node(n) for n in nodes]
    if not ns:
        raise ValueError("parallel() needs at least one node")
    return ns[0].par(*ns[1:]) if len(ns) > 1 else ns[0]


_executor: ThreadPoolExecutor | None = None


def _default_executor() -> ThreadPoolExecutor:
    global _executor
    if _executor is None:
        _executor = ThreadPoolExecutor(max_workers=16, thread_name_prefix="etl4s")
    return _executor


def _as_reader(x):
    from etl4s_spark.core.reader import Reader

    return x if isinstance(x, Reader) else None


def _chain_lineage(a: Lineage | None, b: Lineage | None) -> Lineage | None:
    if a is None:
        return b
    if b is None:
        return a
    return a.chain(b)


def _combine_lineage(a: Lineage | None, b: Lineage | None) -> Lineage | None:
    if a is None:
        return b
    if b is None:
        return a
    return a.combine(b)


# -- branching ---------------------------------------------------------------

class BranchBuilder:
    """First-match conditional routing (reference If/ElseIf/Else,
    :1952-2038; first-match short-circuit tested at
    test/src/Etl4sSpec.scala:1765-1787).

    ``branch().when(pred, node).when(pred2, node2).otherwise(node3)``
    builds a Node; with no ``otherwise``, an unmatched value raises
    ``ValueError`` (reference MatchError analogue).

    For row-level routing inside a DataFrame, use ``F.when`` instead —
    this builder routes whole pipeline payloads (SURVEY.md §2.A19).
    """

    def __init__(self) -> None:
        self._arms: list[tuple[Callable[[Any], bool], Node]] = []
        self._otherwise: Node | None = None

    def when(self, pred: Callable[[Any], bool], n: "Node | Callable") -> "BranchBuilder":
        self._arms.append((pred, node(n)))
        return self

    def otherwise(self, n: "Node | Callable") -> Node:
        self._otherwise = node(n)
        return self.build()

    def build(self) -> Node:
        arms = list(self._arms)
        fallback = self._otherwise

        def run(a: Any) -> Any:
            for pred, n in arms:
                if pred(a):
                    return n.f(a)
            if fallback is not None:
                return fallback.f(a)
            raise ValueError(f"branch: no arm matched value {a!r}")

        return Node(run, name="branch")


def branch() -> BranchBuilder:
    return BranchBuilder()
