"""Validation gates (reference ``ensure`` family,
src-3/Etl4s.scala:1769-1947; check ADT src/Core.scala:17-33).

A check is a callable returning ``None`` (pass) or an error-message string
(fail); predicate-style callables returning bool are also accepted via
``Check.of``. ``ensure`` collects **all** failures (not fail-fast), logs
them to Trace, and raises ``ValidationException``; ``ensure_warn`` only
logs. DataFrame-aware helpers evaluate violation predicates with
``filter(...).limit(1).count()`` so the scan short-circuits (SURVEY.md
§2.A22 mapping).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


class ValidationException(Exception):
    """Raised by ``ensure`` with ALL collected failures
    (reference src/Telemetry.scala:81)."""

    def __init__(self, failures: list[str]):
        self.failures = list(failures)
        super().__init__("; ".join(failures))


@dataclass
class Check:
    """Named validation check over a value (PlainCheck); curried
    config-aware checks (CurriedCheck) are built with ``Check.curried``."""

    name: str
    fn: Callable[[Any], str | None]

    def __call__(self, value: Any) -> str | None:
        return self.fn(value)

    @staticmethod
    def of(name: str, fn: Callable[[Any], Any]) -> "Check":
        """Accept predicate (bool) or message (str|None) callables."""

        def run(value: Any) -> str | None:
            r = fn(value)
            if r is None or r is True:
                return None
            if r is False:
                return f"check failed: {name}"
            return str(r)

        return Check(name, run)

    @staticmethod
    def curried(name: str, fn: Callable[[Any], Callable[[Any], Any]]) -> Callable[[Any], "Check"]:
        """Config-aware check factory: ``cfg -> value -> bool|str|None``
        (reference CurriedCheck, src/Core.scala:17-33)."""

        def bind(cfg: Any) -> Check:
            return Check.of(name, fn(cfg))

        return bind


def run_checks(value: Any, checks: list[Check], parallel: bool = False) -> list[str]:
    """Run all checks, collect all failures (reference collects every error:
    src-3/Etl4s.scala:1859-1881; ensurePar 1886-1900)."""
    if parallel and len(checks) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(checks))) as ex:
            results = list(ex.map(lambda c: c(value), checks))
    else:
        results = [c(value) for c in checks]
    return [r for r in results if r is not None]


# ---- DataFrame-aware check builders ----------------------------------------

def df_no_rows_match(name: str, violation_predicate) -> Check:
    """Fail if ANY row matches the violation predicate. Evaluated as
    ``df.filter(pred).limit(1).count()`` — one short-circuiting job, filter
    pushed into the scan where possible."""

    def fn(df) -> str | None:
        n = df.filter(violation_predicate).limit(1).count()
        return None if n == 0 else f"{name}: found rows violating constraint"

    return Check(name, fn)


def df_not_empty(name: str = "not_empty") -> Check:
    def fn(df) -> str | None:
        return None if df.limit(1).count() > 0 else f"{name}: DataFrame is empty"

    return Check(name, fn)


def df_has_columns(*cols: str) -> Check:
    def fn(df) -> str | None:
        missing = [c for c in cols if c not in df.columns]
        return None if not missing else f"missing columns: {missing}"

    return Check("has_columns", fn)
