"""Sustained-scale composition run (round-3 item 7): clean_corpus →
near-dedup → KG over a replicated ×REPEAT pages stream with the object
store capped far below the working set, recording wall, spill bytes,
own-CPU utilization, and host-contention telemetry.

    GRAFT_SUSTAIN_REPEAT=1600 GRAFT_OBJ_STORE_GB=1 python tools/sustained_run.py

Prints ONE JSON line. Pins the 100×-scale story for the LLM-pipeline
operators (composition, not just the headline): identical edge counts
with and without the store cap prove the pipelines spill instead of
OOM-ing or silently dropping data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _TreeCpuMeter, _cpu_probe_sec, _host_cpu_sample, _loadavg1, _mem_probe_sec  # noqa: E402


def spill_bytes(session_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(session_dir):
        if "ray_spilled_objects" not in root:
            continue
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def training_prep(repeat: int, cap_gb: float, cpus: int, sf_dir: str) -> None:
    """--training-prep: the LLM-data composition under a tight store cap —
    replicated documents → duplicate-span EXCISION → corpus MIXING →
    strided CHUNKING → sequence PACKING. min_count scales ×repeat so the
    excision semantics equal the un-replicated corpus (every original
    occurrence count multiplies by ``repeat``): total removed tokens must
    equal repeat × the original corpus's removal — a deterministic
    invariant recorded in the output for cross-run comparison."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            object_store_memory=int(cap_gb * (1 << 30)),
        )
    from ray.data.context import DataContext

    if os.environ.get("GRAFT_DISABLE_OP_RESERVATION", "1") == "1":
        DataContext.get_current().op_resource_reservation_enabled = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from phrasekit_ray.stages.chunk import chunk_windows
    from phrasekit_ray.stages.dedup import excise_duplicate_spans
    from phrasekit_ray.stages.mix import mix_corpora
    from phrasekit_ray.stages.packing import pack_sequences

    session_dir = ray._private.worker._global_node.get_session_dir_path()
    probe0, mem0 = _cpu_probe_sec(), _mem_probe_sec()
    steal0, jiff0 = _host_cpu_sample()
    meter = _TreeCpuMeter()
    meter.delta_sec()
    t0 = time.perf_counter()

    def replicate_docs(b: pa.Table) -> pa.Table:
        did = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        out = []
        for r in range(repeat):
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(did * repeat + r, pa.int64()),
                        "text": b["text"],
                        "source": b["source"],
                    }
                )
            )
        return pa.concat_tables(out)

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(replicate_docs, batch_format="pyarrow")

    # stage 1: span excision (min_count ×repeat ⇒ original semantics)
    excised = excise_duplicate_spans(
        docs, k=5, min_count=2 * repeat
    ).materialize()
    n_removed = int(
        pa.concat_tables(
            [
                t.select(["n_removed"])
                for t in ray.get(excised.to_arrow_refs())
                if t.num_columns
            ],
            promote_options="default",
        )["n_removed"]
        .cast(pa.int64())
        .to_numpy()
        .sum()
    )
    t1 = time.perf_counter()

    # stage 2: mixture rates by source (re-attach source by id arithmetic:
    # replica ids are doc_id*repeat+r and source is a pure function of
    # the ORIGINAL doc id in the driver tables)
    src_tbl = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    srcs = {
        int(d): s
        for d, s in zip(
            *(lambda t: (t["doc_id"].to_pylist(), t["source"].to_pylist()))(
                pa.concat_tables(
                    [
                        t
                        for t in ray.get(src_tbl.materialize().to_arrow_refs())
                        if t.num_columns
                    ],
                    promote_options="default",
                )
            )
        )
    }
    src_arr_ref = ray.put(srcs)

    def attach_source(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        m = _get_broadcast(src_arr_ref)
        ids = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        orig = ids // repeat
        return b.append_column(
            "source",
            pa.array([m[int(x)] for x in orig.tolist()], pa.string()),
        )

    rates = {f"src{k}": [0.5, 1.0, 1.5, 2.3][k % 4] for k in range(64)}
    mixed = mix_corpora(
        excised.map_batches(attach_source, batch_format="pyarrow"),
        "source",
        rates,
        "doc_id",
    ).materialize()
    n_mixed = mixed.count()
    t2 = time.perf_counter()

    # stage 3+4: strided chunking → sequence packing
    chunks = chunk_windows(
        mixed.map_batches(
            lambda b: pa.table(
                {
                    # unique id per (doc, copy) for the packer
                    "doc_id": pc.add(
                        pc.multiply(
                            b["doc_id"].combine_chunks().cast(pa.int64()), 8
                        ),
                        b["copy"].combine_chunks().cast(pa.int64()),
                    ),
                    "text": b["clean_text"],
                }
            ),
            batch_format="pyarrow",
        ),
        window=32,
        stride=24,
    ).materialize()
    n_chunks = chunks.count()

    def chunk_ids(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(
                    pc.multiply(
                        b["doc_id"].combine_chunks().cast(pa.int64()), 1024
                    ),
                    b["chunk_idx"].combine_chunks().cast(pa.int64()),
                ),
                "n_tokens": b["n_tokens"].combine_chunks().cast(pa.int64()),
            }
        )

    packed = pack_sequences(
        chunks.map_batches(chunk_ids, batch_format="pyarrow"), capacity=2048
    ).materialize()
    n_rows_packed = packed.count()
    t3 = time.perf_counter()

    steal1, jiff1 = _host_cpu_sample()
    out = {
        "metric": "sustained training-prep excise->mix->chunk->pack",
        "repeat": repeat,
        "object_store_gb": cap_gb,
        "num_cpus": cpus,
        "excise_sec": round(t1 - t0, 1),
        "removed_tokens": n_removed,
        "removed_per_replica": n_removed // max(repeat, 1),
        "mix_sec": round(t2 - t1, 1),
        "mixed_rows": n_mixed,
        "chunk_pack_sec": round(t3 - t2, 1),
        "chunks": n_chunks,
        "packed_rows": n_rows_packed,
        "total_sec": round(t3 - t0, 1),
        "cpu_util": round(meter.delta_sec() / ((t3 - t0) * cpus), 3),
        "spill_bytes": spill_bytes(session_dir),
        "steal_pct": round(100.0 * (steal1 - steal0) / max(jiff1 - jiff0, 1), 2),
        "cpu_probe_sec": probe0,
        "mem_probe_sec": [mem0, _mem_probe_sec()],
        "loadavg_end": _loadavg1(),
    }
    print(json.dumps(out))
    ray.shutdown()


def main() -> None:
    import ray

    if "--training-prep" in sys.argv:
        training_prep(
            repeat=int(os.environ.get("GRAFT_SUSTAIN_REPEAT", "400")),
            cap_gb=float(os.environ.get("GRAFT_OBJ_STORE_GB", "1")),
            cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            sf_dir=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        )
        return

    repeat = int(os.environ.get("GRAFT_SUSTAIN_REPEAT", "1600"))
    cap_gb = float(os.environ.get("GRAFT_OBJ_STORE_GB", "1"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            object_store_memory=int(cap_gb * (1 << 30)),
        )
    from ray.data.context import DataContext

    # Under a tight object-store cap, per-operator memory RESERVATION can
    # livelock this composition's wide operator graph on ray 2.49 (driver
    # scheduler spins, workers idle, zero progress — observed at 1-4 GB
    # caps while 8 GB completes). Disable reservation so operators share
    # the budget cooperatively and the executor degrades to spilling.
    if os.environ.get("GRAFT_DISABLE_OP_RESERVATION", "1") == "1":
        DataContext.get_current().op_resource_reservation_enabled = False

    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.clean import clean_corpus
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents
    from phrasekit_ray.stages.dedup import near_dedup_minhash

    import pyarrow as pa

    session_dir = ray._private.worker._global_node.get_session_dir_path()
    probe0, mem0 = _cpu_probe_sec(), _mem_probe_sec()
    steal0, jiff0 = _host_cpu_sample()
    meter = _TreeCpuMeter()
    meter.delta_sec()
    t0 = time.perf_counter()

    # stage 1: quality/repetition/redaction/exact-dedup composition over
    # the replicated documents stream (deterministic distinct int ids:
    # doc_id*repeat + r)
    import numpy as np

    def replicate_docs(b: pa.Table) -> pa.Table:
        did = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        out = []
        for r in range(repeat):
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(did * repeat + r, pa.int64()),
                        "text": b["text"],
                    }
                )
            )
        return pa.concat_tables(out)

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(replicate_docs, batch_format="pyarrow")
    cleaned = clean_corpus(docs).materialize()
    n_clean = cleaned.count()
    t1 = time.perf_counter()

    # stage 2: near-dedup over the cleaned survivors
    import pyarrow.compute as pc

    toks = cleaned.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "tokens": pc.split_pattern(
                    b["text_redacted"].combine_chunks(), " "
                ),
            }
        ),
        batch_format="pyarrow",
    )
    dup_map = near_dedup_minhash(toks)
    t2 = time.perf_counter()

    # stage 3: full KG pipeline over the same replicated stream
    res = run_kg_pipeline(
        pages_from_documents(sf_dir, repeat=repeat),
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3 * repeat),
        ScoreConfig(min_domain_count=3 * repeat),
        tag_concurrency=(cpus, cpus),
        tag_num_cpus=0.5,
        tag_batch_size=2048,
        tag_saturate_pool=True,
    )
    n_edges = res.edges.count()
    t3 = time.perf_counter()

    steal1, jiff1 = _host_cpu_sample()
    pages_n = None
    try:
        import pyarrow.parquet as pq

        pages_n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows * repeat
    except Exception:
        pass
    out = {
        "metric": "sustained composition clean->dedup->kg",
        "repeat": repeat,
        "pages": pages_n,
        "object_store_gb": cap_gb,
        "num_cpus": cpus,
        "clean_sec": round(t1 - t0, 1),
        "clean_survivors": n_clean,
        "dedup_sec": round(t2 - t1, 1),
        "dup_docs": len(dup_map),
        "kg_sec": round(t3 - t2, 1),
        "edges": n_edges,
        "total_sec": round(t3 - t0, 1),
        "pages_per_sec_kg": round(pages_n / (t3 - t2), 1) if pages_n else None,
        "cpu_util": round(meter.delta_sec() / ((t3 - t0) * cpus), 3),
        "spill_bytes": spill_bytes(session_dir),
        "steal_pct": round(100.0 * (steal1 - steal0) / max(jiff1 - jiff0, 1), 2),
        "cpu_probe_sec": probe0,
        "mem_probe_sec": [mem0, _mem_probe_sec()],
        "loadavg_end": _loadavg1(),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
