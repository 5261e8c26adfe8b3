"""Worker-kill fault-injection drill (VERDICT r4 item 4): exercise Ray
task/actor lineage re-execution under real worker death — the property
the 100×-cluster story leans on (SURVEY §4 "FREE: retries") but which
nothing else in the sandbox can exercise.

    GRAFT_SF_DIR=/root/testdata/sf0.01 GRAFT_FAULT_REPEAT=40 \
        python tools/fault_drill.py

Protocol: run the flagship KG pipeline once clean (canonical edge
count), then again while a killer thread SIGKILLs live ``ray::``
worker processes mid-run (never the raylet/GCS — only processes whose
proctitle marks them as executing a task or actor). Asserts the faulted
run completes with the IDENTICAL edge count and reports the recovery
overhead. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _live_worker_pids(my_pid: int) -> list[int]:
    """PIDs of Ray worker processes currently EXECUTING work: Ray
    retitles workers to ``ray::<TaskOrActorName>`` while they run and
    back to ``ray::IDLE`` between tasks. Raylet / GCS / dashboard
    processes never carry the ``ray::`` prefix, so this can't touch
    cluster infrastructure."""
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit() or int(entry) == my_pid:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().split(b"\0")[0].decode("utf-8", "replace")
        except OSError:
            continue
        if cmd.startswith("ray::") and cmd != "ray::IDLE":
            pids.append(int(entry))
    return pids


def _killer(stop: threading.Event, delay_s: float, period_s: float,
            max_kills: int, log: list) -> None:
    """After ``delay_s``, SIGKILL one live worker every ``period_s``
    until ``max_kills`` or the run finishes."""
    if stop.wait(delay_s):
        return
    kills = 0
    while kills < max_kills and not stop.is_set():
        victims = _live_worker_pids(os.getpid())
        if victims:
            pid = victims[kills % len(victims)]
            try:
                os.kill(pid, signal.SIGKILL)
                kills += 1
                log.append({"t": round(time.perf_counter(), 2), "pid": pid})
            except OSError:
                pass
        if stop.wait(period_s):
            return


def run_kg(sf_dir: str, repeat: int) -> tuple[int, float]:
    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents

    t0 = time.perf_counter()
    res = run_kg_pipeline(
        pages_from_documents(sf_dir, repeat=repeat),
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3 * repeat),
        ScoreConfig(min_domain_count=3 * repeat),
        tag_batch_size=2048,
    )
    n = res.edges.count()
    return n, time.perf_counter() - t0


def main() -> None:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    repeat = int(os.environ.get("GRAFT_FAULT_REPEAT", "40"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    delay = float(os.environ.get("GRAFT_FAULT_DELAY", "2.0"))
    period = float(os.environ.get("GRAFT_FAULT_PERIOD", "2.0"))
    max_kills = int(os.environ.get("GRAFT_FAULT_KILLS", "3"))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)

    # first run warms workers/imports; the SECOND clean run is the fair
    # baseline the faulted run is compared against
    canon_edges, _warm_sec = run_kg(sf_dir, repeat)
    canon2, clean_sec = run_kg(sf_dir, repeat)
    assert canon2 == canon_edges, "clean runs disagree — not a fault issue"

    stop = threading.Event()
    kill_log: list = []
    th = threading.Thread(
        target=_killer, args=(stop, delay, period, max_kills, kill_log),
        daemon=True,
    )
    th.start()
    try:
        fault_edges, fault_sec = run_kg(sf_dir, repeat)
    finally:
        stop.set()
        th.join(timeout=5)

    match = fault_edges == canon_edges
    out = {
        "metric": "KG pipeline edge-count parity under SIGKILLed workers",
        "value": int(match),
        "unit": "bool",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "num_cpus": cpus,
        "repeat": repeat,
        "canonical_edges": canon_edges,
        "fault_edges": fault_edges,
        "match": match,
        "kills": len(kill_log),
        "kill_log": kill_log,
        "clean_sec": round(clean_sec, 2),
        "fault_sec": round(fault_sec, 2),
        "recovery_overhead_pct": round(
            100 * (fault_sec - clean_sec) / clean_sec, 1
        ) if clean_sec > 0 else None,
    }
    ray.shutdown()
    print(json.dumps(out))
    if not match:
        sys.exit(1)
    if not kill_log:
        # a drill that never killed anything proved nothing
        sys.exit(2)


if __name__ == "__main__":
    main()
