from etl4s_spark.core.node import (  # noqa: F401
    Node,
    Extract,
    Transform,
    Load,
    Pipeline,
    node,
    identity,
    pure,
    parallel,
)
from etl4s_spark.core.reader import Reader  # noqa: F401
from etl4s_spark.core.trace import Trace, TraceState, current_trace  # noqa: F401
from etl4s_spark.core.telemetry import Tel, ConsoleTelemetry  # noqa: F401
from etl4s_spark.core.lineage import Lineage, LineageGraph  # noqa: F401
from etl4s_spark.core.validation import ValidationException, Check  # noqa: F401
