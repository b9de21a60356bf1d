"""Layer-A pipeline-algebra tests, mirroring the reference suite structure
(/root/reference/etl4s/test/src/Etl4sSpec.scala — BasicSpecs, ReaderSpecs,
ValidationSpecs, ConditionalBranchingSpecs, TelTraceCaptureSpecs)."""

from __future__ import annotations

import time

import pytest

from etl4s_spark.core.node import Node, branch, identity, node, parallel, pure
from etl4s_spark.core.reader import Context, Reader, curried
from etl4s_spark.core.telemetry import ConsoleTelemetry, Tel, provider_scope
from etl4s_spark.core.trace import Trace
from etl4s_spark.core.lineage import Lineage, LineageGraph
from etl4s_spark.core.validation import Check, ValidationException


# ---- BasicSpecs (composition) ----------------------------------------------

def test_chain():
    # reference: "can compose two nodes" (Etl4sSpec.scala BasicSpecs)
    five = pure(5)
    double = node(lambda x: x * 2)
    assert (five >> double).run() == 10


def test_chain_plain_functions():
    # reference: implicit Function1 -> Node conversion (src-3/Etl4s.scala:1163)
    p = node(lambda s: s.strip()) >> (lambda s: s.upper()) >> (lambda s: s + "!")
    assert p.run("  hi ") == "HI!"


def test_associativity():
    # reference: "associative property holds" (Etl4sSpec.scala:223-232)
    a, b, c = node(lambda x: x + 1), node(lambda x: x * 2), node(lambda x: x - 3)
    left = (a >> b) >> c
    right = a >> (b >> c)
    assert left.run(10) == right.run(10) == 19


def test_laziness():
    # reference: nothing runs until unsafeRun (docs/effect.md:63-66)
    ran = []
    p = node(lambda _: ran.append("x"))
    assert ran == []
    p.run(None)
    assert ran == ["x"]


def test_fanout_flattens():
    # reference: TupleAppend auto-flatten a & b & c (src-3/Etl4s.scala:1433-1456)
    a, b, c = node(lambda x: x + 1), node(lambda x: x * 2), node(lambda x: x - 1)
    assert (a & b & c).run(10) == (11, 20, 9)


def test_fanout_into_join_stage():
    # reference: multi-source fan-out then enrich (Etl4sSpec.scala:123-144)
    users = pure({"u1": "alice"})
    orders = pure([("u1", 100)])
    enrich = node(lambda t: [(t[0][uid], amt) for uid, amt in t[1]])
    assert ((users & orders) >> enrich).run() == [("alice", 100)]


def test_seq_keeps_input_and_right_result():
    # reference >> operator (src-3/Etl4s.scala:395-407)
    effects = []
    audit = node(lambda x: effects.append(x))
    main = node(lambda x: x * 10)
    assert audit.seq(main).run(4) == 40
    assert effects == [4]


def test_zip_flattens_nested():
    # reference zip + Flatten (src-3/Etl4s.scala:638-639)
    n = node(lambda _: ((1, 2), 3)).zip()
    assert n.run(None) == (1, 2, 3)


def test_map_flat_map():
    n = pure(5).map(lambda x: x + 1)
    assert n.run() == 6
    # flatMap picks next node from intermediate value; next node re-reads input
    router = node(lambda x: x).flat_map(lambda v: pure("big") if v > 10 else pure("small"))
    assert router.run(20) == "big"
    assert router.run(3) == "small"


def test_tap_passthrough():
    seen = []
    n = node(lambda x: x * 2).tap(seen.append)
    assert n.run(21) == 42
    assert seen == [42]


def test_on_failure():
    # reference onFailure (src-3/Etl4s.scala:559-566)
    boom = node(lambda _: 1 / 0)
    assert boom.on_failure(lambda e: "fallback").run(None) == "fallback"


def test_with_retry_backoff():
    # reference withRetry defaults + exponential backoff
    # (src-3/Etl4s.scala:584-600; TimingSpecs.scala:50-68)
    attempts = []

    def flaky(_):
        attempts.append(time.monotonic())
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert node(flaky).with_retry(max_attempts=3, initial_delay_ms=50).run(None) == "ok"
    assert len(attempts) == 3
    assert attempts[1] - attempts[0] >= 0.05
    assert attempts[2] - attempts[1] >= 0.10  # factor 2.0


def test_with_retry_exhausts():
    n = node(lambda _: 1 / 0).with_retry(max_attempts=2, initial_delay_ms=1)
    with pytest.raises(ZeroDivisionError):
        n.run(None)


def test_run_safe():
    ok = node(lambda x: x + 1).run_safe(1)
    assert ok.ok and ok.get() == 2
    bad = node(lambda _: 1 / 0).run_safe(None)
    assert not bad.ok and isinstance(bad.error, ZeroDivisionError)
    assert bad.get_or_else(99) == 99


def test_run_async():
    fut = node(lambda x: x * 3).run_async(7)
    assert fut.result(timeout=5) == 21


def test_parallel_fanout_concurrency():
    # reference &>: 2×100ms tasks ≈ 100ms wall (TimingSpecs.scala:8-31)
    def slow(tag):
        def f(_):
            time.sleep(0.1)
            return tag
        return f

    t0 = time.monotonic()
    result = parallel(node(slow("a")), node(slow("b"))).run(None)
    wall = time.monotonic() - t0
    assert result == ("a", "b")
    assert wall < 0.19, f"branches did not run concurrently: {wall:.3f}s"


# ---- Trace / Tel -----------------------------------------------------------

def test_trace_logs_and_report():
    # reference unsafeRunTrace (src-3/Etl4s.scala:134-150)
    p = node(lambda x: Trace.log("stage1") or x + 1) >> (lambda x: Trace.log("stage2") or x * 2)
    rep = p.run_trace(5)
    assert rep.result == 12
    assert rep.logs == ["stage1", "stage2"]
    assert rep.time_elapsed_millis >= 0
    assert not rep.has_errors


def test_trace_has_errors_reactivity():
    # reference: downstream reacts to upstream state (Etl4sSpec.scala:492-513)
    def failing(x):
        Trace.error("upstream broke")
        return x

    def downstream(x):
        return "recovered" if Trace.has_errors() else "clean"

    assert (node(failing) >> node(downstream)).run_trace(1).result == "recovered"
    assert (identity() >> node(downstream)).run_trace(1).result == "clean"


def test_trace_propagates_into_parallel_branches():
    # deliberate fix over the reference's ThreadLocal hazard (SURVEY.md §3.1)
    p = parallel(
        node(lambda _: Trace.log("left")),
        node(lambda _: Trace.log("right")),
    )
    rep = p.run_trace(None)
    assert sorted(rep.logs) == ["left", "right"]


def test_run_safe_trace_captures():
    rep = (node(lambda x: Trace.log("before") or x) >> (lambda _: 1 / 0)).run_safe_trace(1)
    assert rep.has_errors and isinstance(rep.errors[0], ZeroDivisionError)
    assert rep.logs == ["before"]


def test_tel_spans_nest_and_counters_aggregate():
    # reference TelTraceCaptureSpecs: span parent/child, counter aggregation
    def work(x):
        with Tel.span("outer"):
            with Tel.span("inner"):
                Tel.add_counter("items.processed", 2)
            Tel.add_counter("items.processed", 3)
        return x

    rep = node(work).run_trace(1)
    spans = rep.telemetry.spans
    assert [s.name for s in spans] == ["outer", "inner"]
    outer, inner = spans
    assert inner.parent_span_id == outer.span_id
    assert outer.parent_span_id is None
    assert rep.telemetry.counters["items.processed"] == 5
    otel = rep.to_otel_json()
    assert '"items.processed"' in otel and '"resourceSpans"' in otel


def test_tel_console_provider():
    lines = []
    with provider_scope(ConsoleTelemetry(emit=lines.append)):
        node(lambda x: Tel.add_counter("c") or x).run_trace(1)
    assert any("counter c" in l for l in lines)


# ---- ValidationSpecs -------------------------------------------------------

def test_ensure_collects_all_failures():
    # reference: ensure collects every error (src-3/Etl4s.scala:1859-1881)
    n = identity().ensure(
        input=[
            Check.of("positive", lambda x: x > 0),
            Check.of("even", lambda x: x % 2 == 0),
        ]
    )
    with pytest.raises(ValidationException) as ei:
        n.run(-3)
    assert len(ei.value.failures) == 2


def test_ensure_output_and_change():
    n = node(lambda x: x * 2).ensure(
        output=Check.of("lt100", lambda x: x < 100),
        change=lambda a, b: b == a * 2,
    )
    assert n.run(10) == 20
    with pytest.raises(ValidationException):
        n.run(60)


def test_ensure_warn_logs_not_raises():
    n = identity().ensure_warn(input=Check.of("positive", lambda x: x > 0))
    rep = n.run_trace(-1)
    assert rep.result == -1
    assert any("WARN" in l for l in rep.logs)


def test_ensure_par():
    n = identity().ensure(
        input=[Check.of(f"c{i}", lambda x: x > 0) for i in range(4)], parallel=True
    )
    assert n.run(5) == 5


# ---- ConditionalBranchingSpecs ---------------------------------------------

def test_branch_first_match_short_circuit():
    # reference first-match semantics (Etl4sSpec.scala:1765-1787)
    calls = []

    def arm(tag, out):
        def f(x):
            calls.append(tag)
            return out
        return f

    n = (
        branch()
        .when(lambda x: x < 18, node(arm("minor", "minor")))
        .when(lambda x: x < 65, node(arm("adult", "adult")))
        .otherwise(node(arm("senior", "senior")))
    )
    assert n.run(10) == "minor"
    assert calls == ["minor"]  # later arms never ran
    assert n.run(30) == "adult"
    assert n.run(70) == "senior"


def test_branch_no_match_raises():
    n = branch().when(lambda x: x > 100, identity()).build()
    with pytest.raises(ValueError):
        n.run(5)


# ---- ReaderSpecs -----------------------------------------------------------

class Cfg:
    def __init__(self, factor=2, is_backfill=False, min_v=0, max_v=100):
        self.factor = factor
        self.is_backfill = is_backfill
        self.min_v = min_v
        self.max_v = max_v


def test_reader_requires_provide():
    # reference requires/provide (src-3/Etl4s.scala:212-218, 834-835)
    scaled = Node.requires(lambda cfg: node(lambda x: x * cfg.factor))
    assert scaled.provide(Cfg(factor=3)).run(5) == 15


def test_reader_chain_shares_env():
    r1 = Node.requires(lambda cfg: node(lambda x: x + cfg.min_v))
    r2 = Node.requires(lambda cfg: node(lambda x: x * cfg.factor))
    p = (r1 >> r2).provide(Cfg(factor=2, min_v=10))
    assert p.run(1) == 22


def test_reader_mixed_with_plain_node():
    r = Node.requires(lambda cfg: node(lambda x: x * cfg.factor))
    p = (r >> (lambda x: x + 1)).provide(Cfg(factor=5))
    assert p.run(2) == 11
    p2 = (node(lambda x: x + 1) >> r).provide(Cfg(factor=5))
    assert p2.run(2) == 15


def test_reader_ask():
    p = (Reader.ask() >> (lambda cfg: cfg.factor)).provide(Cfg(factor=9))
    assert p.run() == 9


def test_reader_fanout():
    r1 = Node.requires(lambda cfg: node(lambda x: x + cfg.min_v))
    r2 = Node.requires(lambda cfg: node(lambda x: x - cfg.min_v))
    assert (r1 & r2).provide(Cfg(min_v=5)).run(10) == (15, 5)


def test_reader_zip_and_run_async_passthroughs():
    # Layer-A symmetry: zip flattens nested fan-out tuples post-provide;
    # run_async(cfg) ≡ provide(cfg).run_async() (VERDICT r1 item 9)
    r1 = Node.requires(lambda cfg: node(lambda x: x + cfg.min_v))
    r3 = Node.requires(lambda cfg: node(lambda x: x * cfg.factor))
    nested = Node.requires(
        lambda cfg: node(lambda x: ((x, x + cfg.min_v), x * cfg.factor))
    )
    assert nested.provide(Cfg(min_v=5, factor=2)).run(10) == ((10, 15), 20)
    assert nested.zip().provide(Cfg(min_v=5, factor=2)).run(10) == (10, 15, 20)
    fut = (r1 >> r3).run_async(Cfg(min_v=5, factor=2), 10)
    assert fut.result(timeout=10) == 30


def test_reader_ctx_branch():
    # reference IfCtx: route purely on config (Etl4sSpec.scala:2113-2138)
    full = node(lambda _: "full_scan")
    bounded = node(lambda _: "bounded_scan")
    r = Reader.branch().when_ctx(lambda cfg: cfg.is_backfill, full).otherwise(bounded)
    assert r.provide(Cfg(is_backfill=True)).run(None) == "full_scan"
    assert r.provide(Cfg(is_backfill=False)).run(None) == "bounded_scan"


def test_reader_data_branch_with_config_condition():
    # reference curried conditions T => B => Boolean (src-3/Etl4s.scala:2310-2324)
    r = (
        Reader.branch()
        .when(lambda cfg, x: x > cfg.max_v, node(lambda x: "over"))
        .otherwise(node(lambda x: "under"))
    )
    assert r.provide(Cfg(max_v=10)).run(50) == "over"
    assert r.provide(Cfg(max_v=100)).run(50) == "under"


def test_reader_curried_ensure():
    # reference context-aware checks (src-3/Etl4s.scala:2374-2392)
    in_range = curried(
        lambda cfg: lambda x: cfg.min_v <= x <= cfg.max_v or f"{x} out of range"
    )
    r = Reader.pure(identity()).ensure(input=in_range)
    assert r.provide(Cfg(min_v=0, max_v=10)).run(5) == 5
    with pytest.raises(ValidationException):
        r.provide(Cfg(min_v=0, max_v=10)).run(50)


def test_context_namespace():
    class MyCtx(Context):
        def scale(self):
            return node(lambda x: x * self.cfg.factor)

    ctx = MyCtx(Cfg(factor=4))
    assert ctx.scale().run(3) == 12
    seen = []
    assert (ctx.scale() >> ctx.tap(lambda cfg, v: seen.append((cfg.factor, v)))).run(2) == 8
    assert seen == [(4, 8)]


# ---- Lineage ---------------------------------------------------------------

def test_lineage_chain_and_combine():
    a = Lineage(name="a", inputs=("raw",), outputs=("mid",))
    b = Lineage(name="b", inputs=("mid",), outputs=("out",))
    chained = a.chain(b)
    assert chained.inputs == ("raw",) and chained.outputs == ("out",)
    combined = a.combine(b)
    assert set(combined.inputs) == {"raw", "mid"}


def test_lineage_attach_and_merge_through_chain():
    e = node(lambda _: 1).with_lineage("extract", inputs=["s3://raw"], outputs=["staged"])
    l = node(lambda x: x).with_lineage("load", inputs=["staged"], outputs=["warehouse"])
    p = e >> l
    assert p.lineage.inputs == ("s3://raw",)
    assert p.lineage.outputs == ("warehouse",)


def test_lineage_graph_auto_infer_and_render():
    # reference auto-infer upstreams by output→input match
    # (src-3/Etl4s.scala:2484-2492; test Etl4sSpec.scala:899-907)
    ingest = Lineage(name="ingest", inputs=("api",), outputs=("bronze",))
    refine = Lineage(name="refine", inputs=("bronze",), outputs=("silver",))
    g = LineageGraph.build([ingest, refine])
    assert ("ingest", "refine") in g.edges
    assert '"ingest" -> "bronze"' in g.to_dot()
    assert "flowchart LR" in g.to_mermaid()
    assert '"datasources"' in g.to_json()


def test_metadata():
    n = node(lambda x: x).with_metadata({"owner": "data-eng"})
    assert n.metadata == {"owner": "data-eng"}
