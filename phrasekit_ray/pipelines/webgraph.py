"""Composed web-graph profile: ONE pass over the corpus, ONE shared
host edge table, every host-level graph signal.

The individual centralities each exist as standalone operators
(stages/kg: hits_exact X147, katz_exact X156, PPR X138,
connected_components_distributed X21/X91, reciprocity X153); a real
web pipeline wants them TOGETHER over one extraction pass — link
extraction over the corpus is the expensive distributed stage, the
host-level graph is the aggregated small side (bounded by distinct
hosts, not pages; X19 global enumeration is the adapter if a corpus
ever has driver-unbounded hosts). This module does the corpus pass
once, materializes one int-keyed edge table, and fans the bounded
graph work out from it.

Reference scope note: the reference engine has no graph module; this
is SURVEY §2.11 extension surface (X165).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def webgraph_profile(pages_ds, iters: int = 4):
    """pages(url, html, …) → one wide host table:

    (host, out_deg, in_deg, n_recip, component_host, auth_micro,
    hub_micro, katz_micro) — degrees/reciprocity over the DISTINCT
    directed no-self-loop edge set, component = lexicographically
    smallest host reachable undirected, HITS and Katz in exact int64
    micro-units (``iters`` rounds each).

    One distributed link-extraction pass; the host edge list is the
    aggregated bounded side (collected once to assign lexicographic
    int ids); HITS/Katz/CC run through the distributed operators
    (bounded fast paths inside), sharing the SAME materialized edge
    Dataset.
    """
    import ray

    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import (
        connected_components_distributed,
        hits_exact,
        katz_exact,
    )

    he_tabs = list(
        host_edges(extract_links(pages_ds)).iter_batches(batch_format="pyarrow")
    )
    he = (
        pa.concat_tables(he_tabs, promote_options="default")
        if he_tabs
        else pa.table({"src_host": pa.array([], pa.string()),
                       "dst_host": pa.array([], pa.string())})
    )
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    # node universe = endpoints of non-self edges (the convention every
    # host-graph twin uses: e AS (SELECT DISTINCT … WHERE src <> dst))
    pairs = [(a, b) for a, b in zip(src, dst) if a != b]
    src = [a for a, _ in pairs]
    dst = [b for _, b in pairs]
    hosts = sorted(set(src) | set(dst))
    if not hosts:
        empty_i = pa.array([], pa.int64())
        return pa.table(
            {
                "host": pa.array([], pa.string()),
                "out_deg": empty_i, "in_deg": empty_i, "n_recip": empty_i,
                "component_host": pa.array([], pa.string()),
                "auth_micro": empty_i, "hub_micro": empty_i,
                "katz_micro": empty_i,
            }
        )
    hid = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    s = np.array([hid[h] for h in src], np.int64)
    o = np.array([hid[h] for h in dst], np.int64)
    # distinct directed edges via the packed key (n ≤ 2^31 hosts)
    packed = np.unique(s * np.int64(n) + o)
    s, o = packed // np.int64(n), packed % np.int64(n)
    edges_tbl = pa.table(
        {"subj": pa.array(s, pa.int64()), "obj": pa.array(o, pa.int64())}
    )
    edges = ray.data.from_arrow(edges_tbl).materialize()

    # degrees + reciprocity: numpy over the already-collected distinct
    # edge list (the bounded aggregated side)
    out_deg = np.zeros(n, np.int64)
    in_deg = np.zeros(n, np.int64)
    np.add.at(out_deg, s, 1)
    np.add.at(in_deg, o, 1)
    edge_set = set(packed.tolist())
    rec = np.fromiter(
        ((int(b) * n + int(a)) in edge_set for a, b in zip(s, o)),
        bool, len(s),
    )
    n_recip = np.zeros(n, np.int64)
    np.add.at(n_recip, s[rec], 1)

    cc = {
        r["node"]: r["label"]
        for b in connected_components_distributed(
            edges, src_col="subj", dst_col="obj"
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    hits = {
        r["node"]: (r["auth_micro"], r["hub_micro"])
        for b in hits_exact(edges, iters=iters).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    katz = {
        r["node"]: r["katz_micro"]
        for b in katz_exact(edges, iters=iters).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }

    ids = list(range(n))
    out = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "out_deg": pa.array(out_deg, pa.int64()),
            "in_deg": pa.array(in_deg, pa.int64()),
            "n_recip": pa.array(n_recip, pa.int64()),
            "component_host": pa.array(
                [hosts[cc.get(i, i)] for i in ids], pa.string()
            ),
            "auth_micro": pa.array(
                [hits.get(i, (0, 0))[0] for i in ids], pa.int64()
            ),
            "hub_micro": pa.array(
                [hits.get(i, (0, 0))[1] for i in ids], pa.int64()
            ),
            "katz_micro": pa.array(
                [katz.get(i, 0) for i in ids], pa.int64()
            ),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))
