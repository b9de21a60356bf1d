"""Config injection: the Reader monad (reference Reader[R, A],
src-3/Etl4s.scala:830-890; composition :922-1064).

``Reader(run)`` wraps ``cfg -> A`` (usually ``cfg -> Node``). Composition
operators mirror Node's, resolved after the environment is provided:

- ``r1 >> r2`` — chain the produced nodes (reference Reader~>Reader,
  :922-937). Python is structurally typed, so the reference's compile-time
  ``ReaderCompat`` environment-merging (identity/subtype/intersection,
  :748-793) degenerates to: both sides receive the SAME env object. Use a
  config object carrying the union of fields (a dataclass or ``Context``
  mapping) — the duck-typed analogue of the Scala intersection type.
- ``r1 & r2`` fan-out, ``r1.par(r2)`` concurrent fan-out, ``r1.seq(r2)``
  effect-sequencing — same semantics as Node.
- mixed Node/Reader composition lifts the Node via ``Reader.pure_node``
  (reference Node~>Reader :367-376, Reader~>Node :942-951).
- config-aware branching: ``Reader.branch().when(lambda cfg, a: ...)``
  (reference curried If conditions, :2310-2324) and ``when_ctx`` for
  config-only routing (reference IfCtx, :2334-2347).
- config-aware validation: ``.ensure(lambda cfg: check)`` (reference
  :2374-2392; CurriedCheck src/Core.scala:17-33).
"""

from __future__ import annotations

from typing import Any, Callable

from etl4s_spark.core.node import BranchBuilder, Node, node


def _lift(x: "Reader | Node | Callable") -> "Reader":
    if isinstance(x, Reader):
        return x
    n = node(x)
    return Reader(lambda _cfg: n)


class Reader:
    """``cfg -> Node`` with Node-like combinators resolved at provide time."""

    __slots__ = ("run", "metadata")

    def __init__(self, run: Callable[[Any], Node], metadata: Any = None) -> None:
        self.run = run
        self.metadata = metadata

    # -- monad --------------------------------------------------------------

    @staticmethod
    def pure(n: "Node | Callable") -> "Reader":
        return _lift(n)

    @staticmethod
    def ask() -> "Reader":
        """Reader whose node emits the config itself (reference ask,
        :887-890)."""
        return Reader(lambda cfg: Node(lambda _a=None: cfg, name="ask"))

    def map(self, fn: Callable[[Node], Node]) -> "Reader":
        return Reader(lambda cfg: fn(self.run(cfg)))

    def flat_map(self, fn: Callable[[Node], "Reader"]) -> "Reader":
        return Reader(lambda cfg: fn(self.run(cfg)).run(cfg))

    # -- provide ------------------------------------------------------------

    def provide(self, cfg: Any) -> Node:
        """Bind the environment, finalizing the node graph (reference
        .provide/.provideContext, :834-835)."""
        return node(self.run(cfg))

    provide_context = provide

    # -- composition (resolved post-provide) ---------------------------------

    def then(self, other: "Reader | Node | Callable") -> "Reader":
        other = _lift(other)
        return Reader(lambda cfg: self.run(cfg).then(other.run(cfg)))

    def __rshift__(self, other) -> "Reader":
        return self.then(other)

    def __rrshift__(self, other) -> "Reader":
        return _lift(other).then(self)

    def fanout(self, *others) -> "Reader":
        readers = [_lift(o) for o in others]
        return Reader(lambda cfg: self.run(cfg).fanout(*(r.run(cfg) for r in readers)))

    def __and__(self, other) -> "Reader":
        return self.fanout(other)

    def par(self, *others) -> "Reader":
        readers = [_lift(o) for o in others]
        return Reader(lambda cfg: self.run(cfg).par(*(r.run(cfg) for r in readers)))

    def seq(self, other: "Reader | Node | Callable") -> "Reader":
        other = _lift(other)
        return Reader(lambda cfg: self.run(cfg).seq(other.run(cfg)))

    # -- node passthroughs ---------------------------------------------------

    def tap(self, fn) -> "Reader":
        return Reader(lambda cfg: self.run(cfg).tap(fn))

    def on_failure(self, handler) -> "Reader":
        return Reader(lambda cfg: self.run(cfg).on_failure(handler))

    def with_retry(self, **kw) -> "Reader":
        return Reader(lambda cfg: self.run(cfg).with_retry(**kw))

    def with_metadata(self, metadata: Any) -> "Reader":
        return Reader(self.run, metadata=metadata)

    def zip(self) -> "Reader":
        """Flatten nested tuple output post-provide (reference Reader zip
        passthrough — Node zip + Flatten, src-3/Etl4s.scala:638-639)."""
        return Reader(lambda cfg: self.run(cfg).zip())

    def run_async(self, cfg: Any, a: Any = None, executor: Any = None):
        """Provide the environment and execute on a worker thread —
        ``reader.run_async(cfg)`` ≡ ``reader.provide(cfg).run_async()``
        (reference runAsync on provided readers, :615)."""
        return self.provide(cfg).run_async(a, executor=executor)

    # -- config-aware validation (reference :2374-2392) ----------------------

    def ensure(self, input=None, output=None, parallel: bool = False) -> "Reader":
        """Checks may be plain (value -> bool|str|None) or curried
        (cfg -> value -> ...); curried ones are bound at provide time."""

        def bind(cfg: Any, checks):
            if checks is None:
                return None
            if not isinstance(checks, (list, tuple)):
                checks = [checks]
            bound = []
            for c in checks:
                r = c(cfg) if _is_curried(c) else c
                bound.append(r)
            return bound

        return Reader(
            lambda cfg: self.run(cfg).ensure(
                input=bind(cfg, input), output=bind(cfg, output), parallel=parallel
            )
        )

    def ensure_warn(self, input=None, output=None, parallel: bool = False) -> "Reader":
        def bind(cfg: Any, checks):
            if checks is None:
                return None
            if not isinstance(checks, (list, tuple)):
                checks = [checks]
            return [c(cfg) if _is_curried(c) else c for c in checks]

        return Reader(
            lambda cfg: self.run(cfg).ensure_warn(
                input=bind(cfg, input), output=bind(cfg, output), parallel=parallel
            )
        )

    # -- branching -----------------------------------------------------------

    @staticmethod
    def branch() -> "ReaderBranchBuilder":
        return ReaderBranchBuilder()

    def __repr__(self) -> str:
        return "Reader(<cfg -> Node>)"


def _is_curried(check) -> bool:
    """A curried check is marked with ``.curried = True`` or built via
    ``Check.curried`` (returns a plain function tagged below)."""
    return getattr(check, "_etl4s_curried", False)


def curried(fn: Callable[[Any], Callable]) -> Callable:
    """Mark a ``cfg -> value -> bool|str|None`` check factory as
    config-aware (reference CurriedCheck)."""
    fn._etl4s_curried = True  # type: ignore[attr-defined]
    return fn


class ReaderBranchBuilder:
    """Config-aware first-match branching (reference Reader If/ElseIf/Else
    :2094-2220 and IfCtx/ElseIfCtx :2124-2209).

    - ``.when(cond, node_or_reader)`` — cond is ``(cfg, value) -> bool``
    - ``.when_ctx(cond, node_or_reader)`` — cond is ``cfg -> bool``
      (ignores the data value)
    - ``.otherwise(...)`` closes the builder, returning a Reader.
    """

    def __init__(self) -> None:
        self._arms: list[tuple[str, Callable, "Reader"]] = []
        self._otherwise: "Reader | None" = None

    def when(self, cond: Callable[[Any, Any], bool], target) -> "ReaderBranchBuilder":
        self._arms.append(("data", cond, _lift(target)))
        return self

    def when_ctx(self, cond: Callable[[Any], bool], target) -> "ReaderBranchBuilder":
        self._arms.append(("ctx", cond, _lift(target)))
        return self

    def otherwise(self, target) -> "Reader":
        self._otherwise = _lift(target)
        return self.build()

    def build(self) -> "Reader":
        arms = list(self._arms)
        fallback = self._otherwise

        def make(cfg: Any) -> Node:
            bb = BranchBuilder()
            for kind, cond, reader in arms:
                target = reader.run(cfg)
                if kind == "ctx":
                    bb.when(lambda _a, _c=cond, _cfg=cfg: _c(_cfg), target)
                else:
                    bb.when(lambda a, _c=cond, _cfg=cfg: _c(_cfg, a), target)
            if fallback is not None:
                return bb.otherwise(fallback.run(cfg))
            return bb.build()

        return Reader(make)


class Context:
    """Namespacing base for config-aware node factories (reference
    Context[T] trait, :1484-1514). Subclass and define node factories as
    methods receiving ``self.cfg``."""

    def __init__(self, cfg: Any) -> None:
        self.cfg = cfg

    def tap(self, fn: Callable[[Any, Any], Any]) -> Node:
        """Config-aware tap (reference Context.tap, :1506-1512)."""
        cfg = self.cfg

        def run(a):
            fn(cfg, a)
            return a

        return Node(run, name="ctx.tap")
