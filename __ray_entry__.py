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


# Driver-facing ordering. The driver's per-round oracle snapshot has
# historically covered the FIRST 50 registered queries (CORRECTNESS_r02 and
# _r03 both contain exactly the first 50 insertion-order keys), leaving 38
# registered queries verified only by the identical in-repo DuckDB harness
# (tests/test_queries_oracle.py). Per VERDICT r3 item 1 we rotate: the 38
# not-yet-driver-certified queries come first, then 12 flagship
# previously-green queries fill the 50-slot window, then the remainder.
# The full registry is unchanged — only presentation order differs.
# Mapping documented in README.md ("Driver query ordering").
_DRIVER_FIRST: list[str] = [
    # 38 registered-but-not-yet-driver-certified (r03 gap), oldest first
    "q_sample_docs_per_lang",
    "q_customers_without_orders",
    "q_parts_in_lineitem",
    "q_unique_tokens_per_lang",
    "q_approx_unique_tokens_per_lang",
    "q_knn_ivf",
    "q_embedding_centroids",
    "q_top_terms_per_lang",
    "q_tag_policies",
    "q_events_tumbling",
    "q_events_numbered",
    "q_events_session_ids",
    "q_events_hopping",
    "q_events_asof_join",
    "q_shipping_priority",
    "q_events_range_window",
    "q_chunk_dedup",
    "q_graph_triangles",
    "q_graph_khop",
    "q_local_supplier_volume",
    "q_lm_nll",
    "q_search_top2",
    "q_bm25_search",
    "q_lm_bigram_nll",
    "q_events_lead_lag",
    "q_lineitem_corr",
    "q_users_click_and_purchase",
    "q_users_click_not_purchase",
    "q_full_outer_revenue",
    "q_bpe_merges",
    "q_fuzzy_part_tokens",
    "q_events_running_total",
    "q_events_pivot",
    "q_corpus_split",
    "q_graph_communities",
    "q_events_rank",
    "q_pack_bins",
    "q_events_unpivot",
    # 6 flagship re-certification anchors (green in r02 and r03)
    "q_kg_triples_flagship",
    "q_mine_bigrams",
    "q_score_ratio",
    "q_tag_all_mentions",
    "q_dedup_minhash",
    "q_clean_corpus",
    # round-4 NEW oracle-checked queries, prioritized into the window:
    # distributed hash-min connected components (canonicalization scale
    # path) vs a recursive-CTE DuckDB transitive closure, plus the five
    # most web-scale-distinctive round-4 operators (duplicate-span
    # excision, link-graph extraction, corpus mixing, weighted sampling,
    # contamination fraction); the remaining round-4 queries follow in
    # registration order and are covered by the identical in-repo
    # harness (tests/test_queries_oracle.py)
    "q_graph_components",
    "q_excise_dup_spans",
    "q_link_hostgraph",
    "q_mix_corpora",
    "q_weighted_sample",
    "q_contamination_fraction",
]


def _driver_order(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_FIRST if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from phrasekit_ray.pipelines.queries import QUERIES

    return _driver_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from phrasekit_ray.pipelines.queries import ORACLE_SQL

    return _driver_order(dict(ORACLE_SQL))
