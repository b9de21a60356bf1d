"""Plan-derived lineage: read a DataFrame's actual sources off its plan
instead of trusting hand-written metadata (SURVEY.md §1.4 — the reference
can only attach lineage manually because its IR is opaque closures,
src-3/Etl4s.scala:2484-2492; a Spark logical plan knows its scans).

``df.inputFiles()`` is the public, analyzer-resolved file list — it sees
through joins, unions, subqueries, and views, so the derived inputs are
ground truth for any batch plan. Combine with hand lineage via
``Lineage.combine`` when business metadata (schedule, owner) is needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl4s_spark.core.lineage import Lineage


def _source_of(path: str) -> str:
    """Collapse a concrete file to its dataset path: multi-file datasets
    (part-* files) report their directory; single-file reads report the
    file itself."""
    base = os.path.basename(path)
    if base.startswith("part-") or base.startswith("_"):
        return os.path.dirname(path)
    return path


def lineage_from_plan(
    df: DataFrame,
    name: str,
    outputs: tuple[str, ...] = (),
    **kwargs,
) -> Lineage:
    """Lineage whose ``inputs`` are derived from the DataFrame's resolved
    scan sources (deduplicated dataset paths, scheme-stripped)."""
    from urllib.parse import urlparse

    def strip_scheme(f: str) -> str:
        # local files render as bare paths; remote URIs (hdfs://, s3a://)
        # keep scheme + authority — they ARE the dataset identity
        return urlparse(f).path if f.startswith("file:") else f

    sources = sorted({_source_of(strip_scheme(f)) for f in df.inputFiles()})
    return Lineage(name=name, inputs=tuple(sources), outputs=tuple(outputs), **kwargs)
