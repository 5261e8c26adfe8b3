"""Worker-kill fault-injection drill (VERDICT r4 item 4): the KG
pipeline must survive a SIGKILLed worker mid-run via Ray task/actor
lineage re-execution and produce the identical edge set. Runs the
drill tool in a subprocess with its OWN Ray instance so killed workers
can't destabilize the shared session fixture."""

import json
import os
import subprocess
import sys


def test_kg_pipeline_survives_worker_kill():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        GRAFT_FAULT_REPEAT="40",
        RAY_GRAFT_CPUS="4",
        GRAFT_FAULT_DELAY="1.0",
        GRAFT_FAULT_PERIOD="1.0",
        GRAFT_FAULT_KILLS="2",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "fault_drill.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode in (0, 2), (
        f"fault drill failed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-1000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["match"] is True
    assert out["canonical_edges"] > 0
    # rc==2 means no kill landed (run finished before the killer fired)
    # — parity still asserted above; rc==0 proves recovery under a real
    # worker death
    if proc.returncode == 0:
        assert out["kills"] >= 1
