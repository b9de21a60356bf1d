"""etl4s_spark — a PySpark-native analytics engine with the pipeline-algebra
capabilities of mattlianje/etl4s (reference: /root/reference, v1.9.1) plus a
first-class relational / LLM-data operator library.

Two layers (see SURVEY.md):

- **Layer A** (``etl4s_spark.core``): the pipeline-composition algebra — a
  lazy, typed ``Node`` wrapper with chaining (``>>``), fan-out (``&``),
  sequencing, branching, retry, validation, config injection (``Reader``),
  tracing, telemetry, and lineage. Pure Python; no Spark dependency, so
  pipelines are unit-testable instantly. Mirrors the reference surface
  (etl4s/src-3/Etl4s.scala) re-expressed Pythonically.

- **Layer B** (``operators``, ``sources``, ``functions``, ``streaming``):
  the relational stdlib the reference delegates to Spark in every documented
  example (docs/examples-spark.md) — scans, joins (incl. as-of / interval),
  aggregations, windows, set ops, scalar functions, plus the LLM-data
  operators (dedup, MinHash-LSH, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale: declarative DataFrame
  plans that Catalyst/AQE optimize, broadcast-able dims, documented shuffle
  behavior, no driver-side collects in hot paths.
"""

__version__ = "0.1.0"

from etl4s_spark.core.node import (  # noqa: F401
    Node,
    Extract,
    Transform,
    Load,
    Pipeline,
    Result,
    branch,
    identity,
    node,
    parallel,
    pure,
)
from etl4s_spark.core.reader import Context, Reader, curried  # noqa: F401
from etl4s_spark.core.trace import Trace, TraceReport  # noqa: F401
from etl4s_spark.core.telemetry import ConsoleTelemetry, Tel, TelemetryProvider  # noqa: F401
from etl4s_spark.core.lineage import Lineage, LineageGraph  # noqa: F401
from etl4s_spark.core.validation import Check, ValidationException  # noqa: F401
