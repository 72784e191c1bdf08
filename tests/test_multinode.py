"""Multi-node topology proof (VERDICT r4 next-round #6).

Everything else in the suite runs on one local node; this test stands up
a virtual 4-node cluster (`ray.cluster_utils.Cluster` — one raylet +
object store per node, no network needed) in a SUBPROCESS (it must own
its own Ray session, separate from the session fixture) and proves the
engine's DAG behaves when blocks actually cross node boundaries:

- the flagship's conv_id exchange fans its reducers out over 2+ nodes
  and the output is byte-identical to a single-node run;
- the word_freq hash aggregate executes on all nodes of the cluster,
  byte-identical to single-node.

The probe script is tests/_multinode_probe.py (not collected).
"""

import json
import os
import subprocess
import sys


def test_multinode_cluster_correctness_and_spread():
    env = dict(os.environ, GRAFT_FAULT_TOKEN=f"multinode{os.getpid()}")
    env.pop("RAY_ADDRESS", None)  # the probe builds its own cluster
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "_multinode_probe.py"),
            "/root/testdata/sf0.001",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["nodes_in_cluster"] == 4
    # the exchange reducers actually fanned out across node boundaries
    assert rep["nodes_seen_qf"] >= 2, rep
    # the hash-aggregate tasks spread too
    assert rep["nodes_seen_wf"] >= 2, rep
    # and the answers did not change when blocks crossed nodes — for the
    # flagship, the hash aggregate AND the join-rich capstone
    assert rep["qf_match"] and rep["wf_match"] and rep["pp_match"], rep
    assert rep["rows"] == 8000
    assert rep["pp_rows"] > 0
