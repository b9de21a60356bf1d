"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) — the
extension seam for sources Spark has no native connector for (internal
REST feeds, proprietary formats, synthetic generators), registered once
per session and then consumed through the ordinary
``spark.read.format(...)`` front door like any built-in.

The shipped example is a DETERMINISTIC synthetic-document generator:
every row is a pure function of its row id (LCG-scrambled integers,
pure arithmetic — no RNG state), so output is identical across runs,
partition counts, task retries, and ENGINES — which is what lets a
DuckDB oracle recompute the full result (q_scan_python_datasource) and
makes the source usable as a reproducible load/test fixture.

Scale posture: ``partitions()`` declares ``parts`` independent splits;
each task generates ONLY its slice from closed-form arithmetic (no
driver materialization, no IO), so the source scales exactly like a
parquet scan with that many splits. Arrow-batch conversion applies on
top (spark.sql.execution.arrow.pyspark.enabled governs the transfer).

Reference parity: the reference DSL consumes whatever its host engine
reads (/root/reference/docs/faq.md:11-15); this is the PySpark-native
answer to "my source has no connector".
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_LANGS = ("en", "de", "fr", "es", "pt")
_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

# LCG constants (Borland; multiplier coprime to the 5-lang and 8-word
# domains so modular classes mix) — scramble the row id so derived
# fields are not trivially monotone; pure int64 arithmetic, engine-neutral
_A = 22_695_477
_C = 1
_M = 2_147_483_647


def synth_row(i: int) -> tuple[int, str, str, int]:
    """The one place the row contract lives: (doc_id, lang, text,
    n_words) as a pure function of the row id. Mirrored literally by
    the q_scan_python_datasource oracle — change both together."""
    h = (_A * i + _C) % _M
    lang = _LANGS[h % len(_LANGS)]
    n_words = 3 + (h % 6)
    words = [_WORDS[(h + 7 * k) % len(_WORDS)] for k in range(n_words)]
    return i, lang, " ".join(words), n_words


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))

    def partitions(self) -> Sequence[InputPartition]:
        step = (self.n + self.parts - 1) // self.parts
        return [
            _Slice(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING face of the same source (Spark 4
    ``simpleStreamReader``): each micro-batch emits the next ``batch``
    row ids until ``n`` are delivered, after which the offset stops
    advancing and ``processAllAvailable`` drains. Offsets are plain
    ``{"offset": i}`` dicts — exactly-once replay is free because rows
    are pure functions of the id, so ``readBetweenOffsets`` (the
    recovery path Spark calls when a batch must be re-read after
    restart) regenerates bit-identical rows from arithmetic alone.

    Scale posture: a SIMPLE stream reader generates rows driver-side by
    contract (Spark prefetches each batch on the driver) — right for
    control-rate feeds (API polls, change feeds); a partition-parallel
    source would implement the full ``DataSourceStreamReader`` with
    ``partitions(start, end)`` instead, splitting the id range like the
    batch reader does."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.batch = max(1, int(options.get("batch", 250)))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch, self.n)
        # a LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator when planning partitions —
        # list iterators are picklable/copyable, generators are not
        return iter([synth_row(i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [synth_row(i) for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", N).option("parts", P)``
    for batch scans; ``spark.readStream.format("synthdocs").option("n",
    N).option("batch", B)`` replays the same rows as B-row micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, text string, n_words bigint"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> None:
    """Idempotent registration of the synthdocs format on a session."""
    spark.dataSource.register(SynthDocsDataSource)
