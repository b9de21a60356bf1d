"""Lineage metadata + graph rendering (reference src/Lineage.scala:20-125,
graph build src-3/Etl4s.scala:2472-2691).

A ``Lineage`` records declared inputs/outputs/upstreams plus operational
metadata. Pipelines composed with ``>>`` merge lineage via ``chain``;
fan-out merges via ``combine``. ``LineageGraph.build`` additionally
auto-infers upstream edges by matching one pipeline's outputs to another's
inputs by dataset name (reference algorithm src-3/Etl4s.scala:2484-2492),
and renders JSON / DOT / Mermaid.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class Lineage:
    name: str = ""
    inputs: tuple[str, ...] = ()
    outputs: tuple[str, ...] = ()
    upstreams: tuple[str, ...] = ()
    schedule: str = ""
    cluster: str = ""
    description: str = ""
    group: str = ""
    tags: tuple[str, ...] = ()
    links: tuple[str, ...] = ()

    @staticmethod
    def _merge_seq(a: tuple[str, ...], b: tuple[str, ...]) -> tuple[str, ...]:
        out = list(a)
        for x in b:
            if x not in out:
                out.append(x)
        return tuple(out)

    def combine(self, other: "Lineage") -> "Lineage":
        """Fan-out merge: union everything (reference src/Lineage.scala:37-48)."""
        return Lineage(
            name=self.name or other.name,
            inputs=self._merge_seq(self.inputs, other.inputs),
            outputs=self._merge_seq(self.outputs, other.outputs),
            upstreams=self._merge_seq(self.upstreams, other.upstreams),
            schedule=self.schedule or other.schedule,
            cluster=self.cluster or other.cluster,
            description=self.description or other.description,
            group=self.group or other.group,
            tags=self._merge_seq(self.tags, other.tags),
            links=self._merge_seq(self.links, other.links),
        )

    def chain(self, other: "Lineage") -> "Lineage":
        """Sequential merge: left's inputs, right's outputs
        (reference src/Lineage.scala:55-66)."""
        return Lineage(
            name=self.name or other.name,
            inputs=self.inputs or other.inputs,
            outputs=other.outputs or self.outputs,
            upstreams=self._merge_seq(self.upstreams, other.upstreams),
            schedule=self.schedule or other.schedule,
            cluster=self.cluster or other.cluster,
            description=self.description or other.description,
            group=self.group or other.group,
            tags=self._merge_seq(self.tags, other.tags),
            links=self._merge_seq(self.links, other.links),
        )

    def with_name(self, name: str) -> "Lineage":
        return replace(self, name=name)


@dataclass
class LineageGraph:
    """Serializable graph (reference LineageGraph, src/Lineage.scala:105-125)."""

    pipelines: list[Lineage] = field(default_factory=list)
    datasources: list[str] = field(default_factory=list)
    clusters: list[str] = field(default_factory=list)
    edges: list[tuple[str, str]] = field(default_factory=list)  # (src, dst)

    @classmethod
    def build(cls, lineages: list[Lineage]) -> "LineageGraph":
        g = cls(pipelines=list(lineages))
        ds: list[str] = []
        for ln in lineages:
            for d in (*ln.inputs, *ln.outputs):
                if d not in ds:
                    ds.append(d)
        g.datasources = ds
        g.clusters = sorted({ln.cluster for ln in lineages if ln.cluster})
        # dataset edges: input -> pipeline -> output
        for ln in lineages:
            for i in ln.inputs:
                g.edges.append((i, ln.name))
            for o in ln.outputs:
                g.edges.append((ln.name, o))
        # explicit upstream edges
        by_name = {ln.name: ln for ln in lineages}
        for ln in lineages:
            for up in ln.upstreams:
                if up in by_name:
                    g.edges.append((up, ln.name))
        # auto-infer: if A.outputs ∩ B.inputs ≠ ∅, A is upstream of B
        # (reference src-3/Etl4s.scala:2484-2492)
        for a in lineages:
            for b in lineages:
                if a.name != b.name and set(a.outputs) & set(b.inputs):
                    edge = (a.name, b.name)
                    if edge not in g.edges:
                        g.edges.append(edge)
        return g

    def to_json(self) -> str:
        return json.dumps(
            {
                "pipelines": [
                    {
                        "name": ln.name,
                        "inputs": list(ln.inputs),
                        "outputs": list(ln.outputs),
                        "upstreams": list(ln.upstreams),
                        "schedule": ln.schedule,
                        "cluster": ln.cluster,
                        "description": ln.description,
                        "group": ln.group,
                        "tags": list(ln.tags),
                        "links": list(ln.links),
                    }
                    for ln in self.pipelines
                ],
                "datasources": self.datasources,
                "clusters": self.clusters,
                "edges": [{"from": a, "to": b} for a, b in self.edges],
            },
            indent=2,
        )

    def to_dot(self) -> str:
        """Graphviz DOT (reference src-3/Etl4s.scala:2542-2578)."""
        lines = ["digraph lineage {", "  rankdir=LR;"]
        pipeline_names = {ln.name for ln in self.pipelines}
        for ln in self.pipelines:
            lines.append(f'  "{ln.name}" [shape=box, style=filled, fillcolor=lightblue];')
        for d in self.datasources:
            if d not in pipeline_names:
                lines.append(f'  "{d}" [shape=cylinder];')
        for a, b in self.edges:
            lines.append(f'  "{a}" -> "{b}";')
        lines.append("}")
        return "\n".join(lines)

    def to_mermaid(self) -> str:
        """Mermaid flowchart (reference src-3/Etl4s.scala:2580-2663)."""
        def mid(name: str) -> str:
            return "".join(c if c.isalnum() else "_" for c in name)

        lines = ["flowchart LR"]
        pipeline_names = {ln.name for ln in self.pipelines}
        for ln in self.pipelines:
            lines.append(f"  {mid(ln.name)}[{ln.name}]")
        for d in self.datasources:
            if d not in pipeline_names:
                lines.append(f"  {mid(d)}[({d})]")
        for a, b in self.edges:
            lines.append(f"  {mid(a)} --> {mid(b)}")
        return "\n".join(lines)
