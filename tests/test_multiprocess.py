"""TRUE multi-process distributed execution (2 hosts x 4 virtual devices):
both ranks must compute the same global DP loss (SURVEY.md §2.3)."""

import os
import re
import subprocess
import sys

import pytest


def test_two_process_dp_step(tmp_path):
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "multiprocess_smoke.py",
    )
    env = dict(os.environ, CNF_COORD="localhost:12399")
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"rank timed out; output:\n{out[-2000:]}")
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        m = re.search(r"loss: ([-\d.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses
