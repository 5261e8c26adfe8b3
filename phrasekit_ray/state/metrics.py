"""Structured per-stage metrics from Ray Data execution stats.

Replaces the reference's stdout-scraping stats plumbing (SURVEY.md M13 —
Ruby regex-parses the binaries' prints) with structured metrics pulled
from the executed Dataset plan, suitable for embedding in lineage
manifests (state/lineage.py) or the bench JSON.
"""

from __future__ import annotations

import re

_OP_RE = re.compile(
    r"Operator (?P<idx>\d+) (?P<name>.+?): "
    r"(?:(?P<tasks>\d+) tasks executed, )?(?P<blocks>\d+) blocks produced"
    r"(?: in (?P<wall>[\d.]+)s)?"
)
_EXEC_RE = re.compile(r"Operator (?P<idx>\d+) (?P<name>.+?): executed in (?P<wall>[\d.]+)s")
_WALL_RE = re.compile(
    r"\* Remote wall time: .*? (?P<total>[\d.]+)(?P<unit>us|ms|s) total"
)

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def parse_dataset_stats(stats_text: str) -> list[dict]:
    """ds.stats() text → [{operator, tasks, blocks, wall_s, remote_wall_s}]."""
    out: list[dict] = []
    current: dict | None = None
    for line in stats_text.splitlines():
        line = line.strip()
        m = _OP_RE.match(line) or _EXEC_RE.match(line)
        if m:
            d = m.groupdict()
            current = {
                "operator": d["name"],
                "tasks": int(d["tasks"]) if d.get("tasks") else None,
                "blocks": int(d["blocks"]) if d.get("blocks") else None,
                "wall_s": float(d["wall"]) if d.get("wall") else None,
                "remote_wall_s": None,
            }
            out.append(current)
            continue
        w = _WALL_RE.match(line)
        if w and current is not None:
            # SUM across suboperators: a multi-stage operator (e.g. Sort =
            # SortMap + SortReduce) prints one Remote-wall line per
            # sub-stage; keeping only the first under-reports remote time
            current["remote_wall_s"] = (current["remote_wall_s"] or 0.0) + float(
                w.group("total")
            ) * _UNIT[w.group("unit")]
    return out


def dataset_metrics(ds) -> list[dict]:
    """Structured metrics for an EXECUTED Dataset (runs stats())."""
    return parse_dataset_stats(ds.stats())
