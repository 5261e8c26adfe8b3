"""Benchmark harness (driver contract).

Default mode: one fresh local Ray session, runs the headline KG pipeline
plus the headline per-operator queries over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages": N, "pages_per_sec": ...}

``--scaling``: runs the headline pipeline twice in FRESH subprocesses
(num_cpus=N then 4N — default 4 vs 16, override with GRAFT_SCALING_LO/HI)
on the same input and reports throughput at both plus scaling efficiency
= (thr_hi / thr_lo) / (cpus_hi / cpus_lo). This is the sandbox proxy for
the N- vs 4N-node cluster rule (BASELINE.md "Target metric" + measured
results).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def run_headline(sf_dir: str) -> dict:
    """Flagship KG pipeline: pages → extract → mine → score → build →
    tag (actor pool) → triples → canonicalize → edge aggregate.
    Consumed streaming (count of edge rows), never fully materialized.

    ``GRAFT_BENCH_REPEAT`` replicates pages in-stream ×R (deterministic;
    count thresholds scale ×R to keep the phrase set comparable) so the
    job is compute-bound rather than fixed-overhead-bound — used by the
    scaling run."""
    import ray

    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents

    import pyarrow.parquet as pq

    repeat = int(os.environ.get("GRAFT_BENCH_REPEAT", "400"))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    pages_n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows * repeat
    t0 = time.perf_counter()
    # fixed-size actor pool sized to leave CPU headroom for the task-pool
    # stages feeding/draining it; small target block size so the expanded
    # stream splits into enough blocks (= actor tasks) to saturate it
    from ray.data.context import DataContext

    # block size targets ~4 tag tasks per actor: too small floods the
    # scheduler with micro-tasks, too large starves the pool
    est_bytes = pages_n * 350
    ctx = DataContext.get_current()
    saved_block_size = ctx.target_max_block_size
    ctx.target_max_block_size = max(
        2 * 1024 * 1024, min(64 * 1024 * 1024, est_bytes // (cpus * 4))
    )
    try:
        res = run_kg_pipeline(
            pages_from_documents(sf_dir, repeat=repeat),
            {" ".join(t): c for t, c in DEMO_BACKGROUND},
            MineConfig(min_n=2, max_n=5, min_count=3 * repeat),
            ScoreConfig(min_domain_count=3 * repeat),
            # full-width pool at half a CPU per actor: tagging shares cores
            # with the task stages feeding it instead of pinning idle CPUs
            tag_concurrency=(cpus, cpus),
            tag_num_cpus=0.5,
            tag_batch_size=2048,
            tag_saturate_pool=True,
            # tokenized corpus ≪ object store at bench scale; avoids running
            # the extract chain twice (mine + tag both consume it)
            materialize_docs=True,
        )
        n_edges = res.edges.count()
    finally:
        # the headline-tuned block size must not leak into bench_queries —
        # the pack runs over un-expanded inputs where the default is right
        ctx.target_max_block_size = saved_block_size
    dt = time.perf_counter() - t0
    return {
        "sec": dt,
        "pages": pages_n,
        "pages_per_sec": pages_n / dt if dt > 0 else 0.0,
        "edges": n_edges,
    }


BENCH_QUERY_NAMES = [
        "q_mine_bigrams",
        "q_score_ratio",
        "q_tag_all_mentions",
        "q_kg_edges",
        "q_dedup_exact",
        "q_dedup_minhash",
        "q_token_counts",
        "q_langid",
        "q_fingerprints",
        "q_knn_cosine",
        "q_knn_ivf",
        "q_jaccard_pairs",
        "q_spell_correct",
        "q_events_sessions",
        "q_events_asof",
        "q_repetition",
        "q_events_value_quantiles",
        "q_events_numbered",
        "q_redact",
        "q_clean_corpus",
        "q_heavy_hitter_tokens",
        "q_pages_per_section",
        "q_graph_triangles",
        "q_lm_nll",
        "q_events_lead_lag",
        "q_events_running_total",
        "q_events_rank",
        "q_events_pivot",
        "q_corpus_split",
        "q_lineitem_corr",
        "q_fuzzy_part_tokens",
        "q_join_customer_orders",
        "q_lineitem_pricing",
        "q_orders_priority_revenue",
        "q_events_type_stats",
        # round-4 operators
        "q_repeat_orders_30d",
        "q_latest_event_per_user",
        "q_events_moving_sum",
        "q_lineitem_small_parts",
        "q_event_types_per_user",
        "q_events_time_weighted",
        "q_returned_revenue_by_nation",
        "q_events_value_histogram_quantiles",
        "q_click_purchase_attribution",
        "q_events_funnel",
        "q_mode_event_type",
        "q_events_value_zscore",
        "q_doc_chunks",
        "q_dup_ngram_docs",
        "q_quality_filter",
        "q_weighted_sample",
        "q_link_hostgraph",
        "q_host_pagerank",
        "q_mix_corpora",
        "q_contamination_fraction",
        "q_excise_dup_spans",
        "q_dedup_keep_best",
        "q_random_projection",
        "q_quality_percent_rank",
        "q_hybrid_rrf",
        "q_graph_kcore",
        "q_graph_assortativity",
        "q_props_extract",
        "q_cms_top_tokens",
        "q_anchor_texts",
        "q_canonical_urls",
        "q_warc_roundtrip",
        "q_corpus_diff",
        "q_centroid_confusion",
        "q_orc_interop",
        "q_corpus_entropy",
        "q_kg_edge_provenance",
        "q_blocklist_filter",
        "q_mention_contexts",
        "q_weighted_sample_per_lang",
        "q_lang_mismatch",
        "q_dup_rate_per_source",
        "q_media_decode",
        "q_kmeans",
        "q_semantic_dedup",
        "q_dsir_weights",
        "q_link_prediction",
        "q_media_probe",
        "q_pq_search",
        "q_ppr_hosts",
        "q_sssp_hosts",
        "q_skyline_docs",
        "q_lm_kn_nll",
        "q_blocking_pairs",
        "q_ngram_novelty",
        "q_zonemap_range_read",
        "q_kmv_distinct_tokens",
        "q_hamming_ann",
        "q_hits_hosts",
        "q_kg_negative_edges",
        "q_kg_latest_facts",
        "q_clustering_coeff",
        "q_edge_support",
        "q_graph_ktruss",
        "q_pq_encode",
        "q_host_reciprocity",
        "q_degree_histogram",
        "q_triangle_estimate",
        "q_katz_hosts",
        "q_kg_edge_decay",
        "q_graph_eccentricity",
        "q_edge_embeddedness",
        "q_kg_cardinality_profile",
        "q_ipc_interop",
        "q_user_activity_bitmap",
        "q_corpus_drift",
        "q_source_ttr",
        "q_webgraph_profile",
        "q_host_cocitation",
        "q_kg_growth",
        "q_kg_npmi_edges",
        "q_kg_2hop_paths",
        "q_kg_symmetry",
        "q_random_walks",
        "q_kg_conflicts",
        "q_boilerplate_segments",
        "q_kg_alias_ambiguity",
        "q_clean_boilerplate",
        "q_doc_keywords",
        "q_kg_threshold_curve",
        "q_alias_disambig",
        "q_entity_density",
        "q_walk_ppmi",
        "q_ccnet_buckets",
        "q_containment_pairs",
        "q_prefix_jaccard_pairs",
        "q_mutual_nn",
        "q_alias_clusters",
        "q_winnow_fingerprints",
        "q_syndication_matrix",
        "q_event_bursts",
        "q_source_top_bigrams",
        "q_incremental_dedup_index",
        "q_phrase_context_entropy",
        "q_tag_vote",
        "q_compact_snapshots",
        "q_kg_trust",
]


def bench_queries(sf_dir: str, meter=None) -> tuple[dict, dict]:
    """Per-operator wall times + own-CPU utilization for the query pack."""
    from phrasekit_ray.pipelines.queries import QUERIES

    names = BENCH_QUERY_NAMES
    cpus = _num_cpus()
    meter = meter or _TreeCpuMeter()
    meter.delta_sec()  # prime: discard CPU accumulated before the pack
    out, util = {}, {}
    for name in names:
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        # force lazy datasets to execute
        if hasattr(res, "count") and not hasattr(res, "column_names"):
            res.count()
        wall = time.perf_counter() - t0
        out[name] = round(wall, 3)
        util[name] = round(meter.delta_sec() / (wall * cpus), 3)
    return out, util


def _loadavg1() -> float:
    """1-minute load average — co-tenant load that hypervisor steal jiffies
    cannot see (in-VM neighbors) shows up here."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


class _TreeCpuMeter:
    """Own-process-tree CPU meter: samples utime+stime of this process and
    every live descendant (the whole local Ray runtime — raylet, workers)
    and accumulates PER-PID increments, so a worker exiting between
    samples can never drive the delta negative (its unreported tail is a
    small undercount). utilization = Δtree_cpu / (wall × num_cpus) ≈ 1
    proves the run owned its CPUs; ≪ 1 at low steal_pct proves in-VM
    co-tenant contention (the round-2 bench ambiguity this telemetry
    exists to resolve)."""

    def __init__(self) -> None:
        self._hz = os.sysconf("SC_CLK_TCK")
        self._prev: dict[int, int] = {}

    def _snapshot(self) -> dict[int, int]:
        procs: dict[int, tuple[int, int]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    s = f.read()
                rest = s[s.rindex(")") + 2:].split()
                procs[int(pid)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
            except (OSError, ValueError, IndexError):
                continue
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in procs.items():
            kids.setdefault(ppid, []).append(pid)
        tree, stack = {}, [os.getpid()]
        while stack:
            p = stack.pop()
            if p in procs:
                tree[p] = procs[p][1]
                stack.extend(kids.get(p, []))
        return tree

    def delta_sec(self) -> float:
        """CPU seconds the tree burned since the previous call."""
        cur = self._snapshot()
        d = 0
        for pid, cpu in cur.items():
            prev = self._prev.get(pid)
            if prev is None:
                d += cpu
            elif cpu >= prev:
                d += cpu - prev
        self._prev = cur
        return d / self._hz


def _host_cpu_sample() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — the sandbox VM shares a
    host, and steal time is the ground truth for 'this run was slowed by
    a noisy neighbor, not by the code'."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:
        return 0, 0


def _cpu_probe_sec() -> float:
    """Fixed single-core workload (~0.3 s on an idle host): calibrates
    how contended the host is at measurement time."""
    import hashlib

    blob = b"x" * 1_000_000
    t0 = time.perf_counter()
    for _ in range(200):
        hashlib.md5(blob).digest()
    return round(time.perf_counter() - t0, 3)


def _mem_probe_sec() -> float:
    """Fixed RANDOM-ACCESS memory workload (~0.15 s healthy): 8M
    searchsorted probes over an 8 MB sorted array. This sandbox's host
    intermittently degrades random DRAM access ~40× (co-tenant memory
    contention) while sequential compute and steal_pct stay NORMAL — the
    md5 probe and steal telemetry cannot see it, but every sort / hash /
    join kernel is hit. A slow mem_probe with a quiet cpu_probe marks
    the run as memory-contended, not code-regressed."""
    import numpy as np

    rng = np.random.default_rng(0)
    table = np.sort(rng.integers(0, 1 << 62, 1_000_000))
    probes = rng.integers(0, 1 << 62, 8_000_000)
    t0 = time.perf_counter()
    np.searchsorted(table, probes)
    return round(time.perf_counter() - t0, 3)


def _wait_clean_window() -> list:
    """Bounded pre-gate: this sandbox's host has bursty co-tenant
    contention (steal bursts AND the steal-invisible DRAM-latency mode —
    see _mem_probe_sec); a run started mid-burst measures the burst, not
    the code. Sample mem_probe every 15 s for up to
    $GRAFT_BENCH_WAIT_CLEAN seconds (default 240; 0 disables) and start
    as soon as it reads healthy (< 0.5 s). Proceed regardless when the
    budget runs out — the probe history is recorded in the output JSON
    so a still-contended run is self-identifying."""
    budget = float(os.environ.get("GRAFT_BENCH_WAIT_CLEAN", "240"))
    history = []
    t0 = time.perf_counter()
    while True:
        m = _mem_probe_sec()
        history.append(m)
        # wall-clock budget including probe time — contended probes take
        # seconds each, exactly when the gate is waiting
        elapsed = time.perf_counter() - t0
        if m < 0.5 or elapsed >= budget:
            return history
        time.sleep(min(15.0, max(budget - elapsed, 0.1)))


def run_once(headline_only: bool = False) -> dict:
    import ray

    sf_dir = _sf_dir()
    cpus = _num_cpus()
    wait_history = _wait_clean_window()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    probe0 = _cpu_probe_sec()
    mem0 = wait_history[-1]
    steal0, jiff0 = _host_cpu_sample()
    load0 = _loadavg1()
    meter = _TreeCpuMeter()
    meter.delta_sec()  # prime: discard CPU accumulated by ray.init
    t0 = time.perf_counter()
    head = run_headline(sf_dir)
    head_wall = time.perf_counter() - t0
    head_util = round(meter.delta_sec() / (head_wall * cpus), 3)
    t_probe = time.perf_counter()
    mem_mid = _mem_probe_sec()  # catches a burst arriving during the headline
    probe_overhead = time.perf_counter() - t_probe
    if headline_only:
        queries, q_util = {}, {}
    else:
        queries, q_util = bench_queries(sf_dir, meter)
    total = time.perf_counter() - t0 - probe_overhead
    steal1, jiff1 = _host_cpu_sample()
    load1 = _loadavg1()
    result = {
        "metric": "pages/sec end-to-end triple extraction (KG pipeline) + operator pack",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"kg_headline": round(head["sec"], 3), **queries},
        "sf": _sf_label(sf_dir),
        "num_cpus": cpus,
        "pages": head["pages"],
        "repeat": int(os.environ.get("GRAFT_BENCH_REPEAT", "400")),
        "pages_per_sec": round(head["pages_per_sec"], 2),
        "edges": head["edges"],
        # host-contention telemetry: steal_pct = share of this run's
        # host CPU jiffies stolen by the hypervisor/neighbors;
        # cpu_probe_sec ≈ 0.3 on an idle host, scales with contention
        "steal_pct": round(
            100.0 * (steal1 - steal0) / max(jiff1 - jiff0, 1), 2
        ),
        "cpu_probe_sec": probe0,
        # random-access memory probe at start/end: ~0.15 s healthy; the
        # host intermittently degrades random DRAM access ~40× with
        # steal_pct and cpu_probe NORMAL — this is the only signal that
        # catches it
        "mem_probe_sec": [mem0, mem_mid, _mem_probe_sec()],
        "wait_clean_probes": wait_history,
        # own-process-tree CPU utilization per query: Δ(Σ worker cpu-time)
        # / (wall × num_cpus). ≈1 → the run owned its CPUs; ≪1 with low
        # steal_pct → in-VM co-tenant contention (not a code regression)
        "cpu_util": {"kg_headline": head_util, **q_util},
        "loadavg": [load0, load1],
    }
    ray.shutdown()
    return result


def run_graph_paths() -> dict:
    """VERDICT r3 item 4: measure the graph pack BOTH ways on the same
    input — the bounded driver fast paths (what the default bench hits
    at sf0.1) and the forced distributed paths (what runs at 100× when
    the bounds are exceeded) — and check the outputs are identical.
    All broadcast/driver bounds are forced to 0 for the distributed leg.
    """
    import ray

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = _sf_dir()
    cpus = _num_cpus()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    from phrasekit_ray.stages.kg import (
        cooccurrence_edges,
        k_hop,
        triangle_counts,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    n_rows = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    mem0 = _mem_probe_sec()
    out: dict = {"sf": _sf_label(sf_dir), "num_cpus": cpus, "lineitem_rows": n_rows}
    results: dict[str, dict] = {}
    for mode in ("driver_fast_path", "distributed_forced"):
        forced = mode == "distributed_forced"
        t0 = time.perf_counter()
        edges = cooccurrence_edges(
            li, "l_orderkey", "l_partkey", input_rows=n_rows,
            driver_rows_threshold=0 if forced else 20_000_000,
        ).materialize()
        t_edges = time.perf_counter() - t0

        t0 = time.perf_counter()
        tri = triangle_counts(
            edges,
            **({"broadcast_nodes": 0, "broadcast_edges": 0} if forced else {}),
        )
        tri_tbl = pa.concat_tables(
            ray.get(tri.materialize().to_arrow_refs())
        ).sort_by([("node", "ascending")])
        t_tri = time.perf_counter() - t0

        t0 = time.perf_counter()
        kh = k_hop(edges, hops=3, **({"broadcast_edges": 0} if forced else {}))
        kh_tbl = pa.concat_tables(
            ray.get(kh.materialize().to_arrow_refs())
        ).sort_by([("node", "ascending")])
        t_khop = time.perf_counter() - t0

        out[mode] = {
            "cooccurrence_edges_sec": round(t_edges, 3),
            "triangles_sec": round(t_tri, 3),
            "khop_sec": round(t_khop, 3),
            "edges": edges.count(),
            "tri_rows": tri_tbl.num_rows,
            "khop_rows": kh_tbl.num_rows,
        }
        results[mode] = {"tri": tri_tbl, "khop": kh_tbl}

    def _conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: t[c].cast(pa.int64()) for c in t.column_names}
        )

    out["outputs_identical"] = bool(
        _conform(results["driver_fast_path"]["tri"]).equals(
            _conform(results["distributed_forced"]["tri"])
        )
        and _conform(results["driver_fast_path"]["khop"]).equals(
            _conform(results["distributed_forced"]["khop"])
        )
    )
    out["mem_probe_sec"] = [mem0, _mem_probe_sec()]
    ray.shutdown()
    return out


def run_skew_worker() -> dict:
    """Zipfian hot-key aggregate stress (SURVEY.md §4 skew treatment).

    Deterministic synthetic keys: row id → splitmix64 → uniform u →
    key = floor(1/u) capped at 10^6, i.e. P(key=1) ≈ 1/2 of ALL rows —
    a pathological hot key. Correctness cross-check: the per-key counts
    must sum to the row count exactly (the partial combine collapses the
    hot key to ≤1 row per block before the shuffle, so the hot key can
    never overload one finalize partition)."""
    import numpy as np
    import ray

    from phrasekit_ray.stages.agg import grouped_count

    cpus = _num_cpus()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    n = int(os.environ.get("GRAFT_SKEW_ROWS", "200000000"))
    ds = ray.data.range(n, override_num_blocks=cpus * 8)

    def gen(batch):
        ids = batch["id"].astype(np.uint64)
        h = (ids + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(29)
        u = np.maximum((h >> np.uint64(11)).astype(np.float64) / float(1 << 53),
                       1e-12)
        key = np.minimum(1.0 / u, 1e6).astype(np.int64)
        return {"key": key}

    keyed = ds.map_batches(gen, batch_format="numpy")
    t0 = time.perf_counter()
    counts = grouped_count(keyed, "key").materialize()
    dt = time.perf_counter() - t0
    total = int(counts.sum("count"))
    hot = int(counts.max("count"))
    groups = counts.count()
    assert total == n, f"skew aggregate lost rows: {total} != {n}"
    ray.shutdown()
    return {
        "sec": round(dt, 3),
        "rows": n,
        "rows_per_sec": round(n / dt, 1),
        "groups": groups,
        "hot_key_share": round(hot / n, 4),
        "num_cpus": cpus,
    }


def _parse_worker_json(proc, label: str) -> dict:
    """Parse the one-line JSON a bench worker subprocess prints; surface the
    worker's stderr on failure instead of an opaque IndexError."""
    lines = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench {label} failed (rc={proc.returncode}); stderr tail:\n"
            + "\n".join(proc.stderr.strip().splitlines()[-20:])
        )
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError as e:
        raise RuntimeError(
            f"bench {label} printed non-JSON output: {lines[-1]!r}"
        ) from e


def run_skew() -> dict:
    """Hot-key aggregate at two parallelism levels (VERDICT item 9)."""
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    runs = {}
    for cpus in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--skew-worker"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        runs[cpus] = _parse_worker_json(proc, f"skew-worker cpus={cpus}")
    thr_lo, thr_hi = runs[lo]["rows_per_sec"], runs[hi]["rows_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo > 0 else 0.0
    return {
        "metric": "Zipfian hot-key aggregate throughput (rows/sec) at two parallelism levels",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": "synthetic",
        "num_cpus": hi,
        "queries": {
            f"skew_agg_cpus{lo}": runs[lo]["sec"],
            f"skew_agg_cpus{hi}": runs[hi]["sec"],
        },
        "rows": runs[hi]["rows"],
        "hot_key_share": runs[hi]["hot_key_share"],
        "rows_per_sec": {str(lo): thr_lo, str(hi): thr_hi},
        "efficiency": round(eff, 3),
    }


def run_scaling() -> dict:
    """Same headline job in two fresh processes at low/high parallelism."""
    # N vs 4N protocol (BASELINE.md): 4 vs 16 CPUs. The 8→32 pair dips to
    # ~0.66 because this single node's DRAM bandwidth saturates beyond ~16
    # cores (per-core throughput falls and larger inputs don't lift the
    # 32-cpu rate) — a machine artifact a real 4x-node cluster doesn't
    # have, since bandwidth scales with nodes. Both pairs in BASELINE.md.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    repeat = os.environ.get("GRAFT_BENCH_REPEAT", "400")
    runs = {}
    for cpus in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_BENCH_REPEAT=repeat)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        runs[cpus] = _parse_worker_json(proc, f"worker cpus={cpus}")
    thr_lo = runs[lo]["pages_per_sec"]
    thr_hi = runs[hi]["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo > 0 else 0.0
    return {
        "metric": "scaling efficiency (fresh ray.init at num_cpus=%d vs %d)" % (lo, hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": runs[hi]["sf"],
        "num_cpus": hi,
        "queries": {
            f"kg_headline_cpus{lo}": runs[lo]["queries"]["kg_headline"],
            f"kg_headline_cpus{hi}": runs[hi]["queries"]["kg_headline"],
        },
        "pages_per_sec": {str(lo): thr_lo, str(hi): thr_hi},
        "efficiency": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="two-parallelism scaling run")
    ap.add_argument(
        "--skew", action="store_true",
        help="Zipfian hot-key aggregate stress at two parallelism levels",
    )
    ap.add_argument(
        "--graph-paths", action="store_true",
        help="graph pack: bounded driver fast path vs forced distributed path",
    )
    ap.add_argument(
        "--worker", action="store_true", help="internal: single headline-only run"
    )
    ap.add_argument(
        "--skew-worker", action="store_true", help="internal: single skew run"
    )
    args = ap.parse_args()
    if args.scaling:
        out = run_scaling()
    elif args.skew:
        out = run_skew()
    elif args.graph_paths:
        out = run_graph_paths()
    elif args.skew_worker:
        out = run_skew_worker()
    elif args.worker:
        out = run_once(headline_only=True)
    else:
        out = run_once()
    print(json.dumps(out))
    if args.worker or args.skew_worker:
        # internal subprocess modes: the parent parses the LAST line as
        # the full result dict — no summary line here
        return
    # Compact self-contained summary printed LAST (VERDICT r4 item 7):
    # the driver records only the final ~2000 chars of stdout, and the
    # full 131-query maps push the headline out of that window. This
    # line always fits and always parses on its own.
    summary = {
        "metric": out.get("metric"),
        "value": out.get("value"),
        "unit": out.get("unit"),
        "sf": out.get("sf"),
        "num_cpus": out.get("num_cpus"),
    }
    for k in (
        "pages", "pages_per_sec", "edges", "steal_pct", "cpu_probe_sec",
        "mem_probe_sec", "efficiency", "rows_per_sec",
    ):
        if k in out:
            summary[k] = out[k]
    if isinstance(out.get("queries"), dict) and "kg_headline" in out["queries"]:
        summary["kg_headline_sec"] = out["queries"]["kg_headline"]
    if isinstance(out.get("queries"), dict) and len(out["queries"]) <= 4:
        summary["queries"] = out["queries"]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
