"""Property-based tests (hypothesis) for the Layer-A algebra — laws the
reference only spot-checks (associativity, test/src/Etl4sSpec.scala:223-232)
hold for ALL inputs here."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from etl4s_spark import Node, branch, node, pure

ints = st.integers(min_value=-(10**9), max_value=10**9)


@given(ints, ints, ints, ints)
def test_chain_is_associative(x, a, b, c):
    f = node(lambda v: v + a)
    g = node(lambda v: v * 2 + b)
    h = node(lambda v: v - c)
    assert ((f >> g) >> h).run(x) == (f >> (g >> h)).run(x)


@given(ints)
def test_identity_is_neutral(x):
    f = node(lambda v: v * 3 + 1)
    ident = node(lambda v: v)
    assert (ident >> f).run(x) == f.run(x) == (f >> ident).run(x)


@given(ints, ints)
def test_fanout_components_equal_individual_runs(x, a):
    f = node(lambda v: v + a)
    g = node(lambda v: v * v)
    assert f.fanout(g).run(x) == (f.run(x), g.run(x))


@given(ints)
def test_fanout_flattens_to_single_tuple(x):
    f = node(lambda v: v + 1)
    g = node(lambda v: v + 2)
    h = node(lambda v: v + 3)
    out = f.fanout(g, h).run(x)
    assert out == (x + 1, x + 2, x + 3)  # flat 3-tuple, not ((a,b),c)


@given(ints, ints)
def test_map_equals_chain_with_pure_function(x, a):
    f = node(lambda v: v * 2)
    assert f.map(lambda v: v + a).run(x) == (f >> node(lambda v: v + a)).run(x)


@given(ints)
def test_branch_first_match_wins(x):
    b = (
        branch()
        .when(lambda v: v % 2 == 0, node(lambda v: "even"))
        .when(lambda v: v % 4 == 0, node(lambda v: "mult4"))  # never reached
        .otherwise(node(lambda v: "odd"))
    )
    assert b.run(x) == ("even" if x % 2 == 0 else "odd")


@given(ints)
def test_run_safe_never_raises_and_roundtrips(x):
    ok = node(lambda v: v + 1)
    bad = node(lambda v: v / 0)
    assert ok.run_safe(x).get() == x + 1
    r = bad.run_safe(x)
    assert not r.ok and r.get_or_else(-1) == -1


@given(ints)
def test_on_failure_recovers_with_handler_value(x):
    bad = node(lambda v: 1 / 0).on_failure(lambda e: "fallback")
    assert bad.run(x) == "fallback"
    good = node(lambda v: v).on_failure(lambda e: "fallback")
    assert good.run(x) == x


@given(ints)
def test_pure_ignores_input(x):
    assert pure(42).run(x) == 42


@given(ints, ints)
def test_seq_keeps_right_result_feeds_same_input(x, a):
    seen = []
    left = node(lambda v: seen.append(v))
    right = node(lambda v: v + a)
    assert left.seq(right).run(x) == x + a
    assert seen[-1] == x  # left saw the ORIGINAL input, not left's output
