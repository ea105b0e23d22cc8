"""In-suite multi-process (gloo) collectives tests — VERDICT r4 #7.

Each test spawns 2 separate JAX processes (own runtimes, own local
devices, linked only by the coordination service — the structure of a
2-host pod slice with gloo in place of ICI/DCN) through
``tools/launch_distributed.py`` and asserts the worker's own
allclose-vs-single-chip check.  This covers the cross-process
``process_allgather`` path (parallel/wl.py ``_to_host``) that no
single-process test can reach.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(HERE, "tools", "launch_distributed.py")

# distinct ports per path: sequential tests must not collide with a
# lingering coordination service from the previous one
_PORTS = {"dataset": 12391, "rect": 12392, "large": 12393}


def _run_launcher(path, extra=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)    # worker forces cpu itself
    cmd = [sys.executable, LAUNCHER, "--processes", "2",
           "--devices-per-proc", "2", "--graphs", "24", "--n-iter", "2",
           "--path", path, "--coordinator",
           "127.0.0.1:%d" % _PORTS[path], *extra]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=420, env=env, cwd=HERE)
    assert out.returncode == 0, (out.stdout, out.stderr[-2000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
@pytest.mark.parametrize("path,extra", [
    ("dataset", ()),
    ("rect", ()),
    ("large", ("--big-nodes", "600")),
])
def test_two_process_gloo_path_matches_single_chip(path, extra):
    res = _run_launcher(path, extra)
    assert res["processes"] == 2
    assert res["allclose_vs_single_chip"] is True
