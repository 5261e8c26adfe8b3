"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the phrasekit_ray library calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001: pages (derived
    deterministically from the documents table per BASELINE.json
    input_hint) → extract → mine → score → build → tag → triples →
    canonicalized edges. Returns the edge table."""
    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    res = run_kg_pipeline(
        pages,
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3),
        ScoreConfig(min_domain_count=3),
        tag_concurrency=(1, 4),
    )
    return res.edges


def queries() -> dict[str, Callable[[str], Any]]:
    from phrasekit_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from phrasekit_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
