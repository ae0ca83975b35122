"""TRUE multi-process DRIVER-LEVEL training (2 hosts x 4 virtual CPU devices
each): both ranks run the real ``drivers.conv`` main loop end to end for >= 2
epochs on class-pure global batches and must log IDENTICAL global losses
(VERDICT round-1 item 1; reference batching semantics conv_cINN.py:271-304)."""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_ranks(extra_args, tmp_path, port, timeout=900):
    # generous timeout: the 2-rank compile+run takes ~5 min when the host is
    # loaded (e.g. a concurrent TF parity leg), and a spurious timeout here
    # reads as a sharding bug
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = []
    for i in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "arl_conditional_normalizing_flows_tpu.drivers.conv",
                    "--cpu",
                    "--coordinator",
                    f"localhost:{port}",
                    "--num-processes",
                    "2",
                    "--process-id",
                    str(i),
                    "--outdir",
                    str(tmp_path / f"out"),
                ]
                + extra_args,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                text=True,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            pytest.fail(f"rank timed out; output:\n{out[-3000:]}")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def _epoch_losses(out):
    # fit() verbose rows: "epoch N: loss=... z_loss=..."
    rows = {}
    for m in re.finditer(r"epoch (\d+): loss=([-\d.]+)", out):
        rows[int(m.group(1))] = float(m.group(2))
    return rows


def test_conv_driver_two_process_identical_losses(tmp_path):
    outs = _run_ranks(
        [
            "--dataset", "synthetic",
            "--synthetic-per-class", "128",
            "--data-classes", "0", "1",
            "--batch-size", "16",
            "--epochs", "2",
            "--annealing-epochs", "1",
            "--no-dilations",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "8", "8",
            "--cardinality", "2", "2",
            "--eval-samples", "4",
            "--checkpoint-every", "0",
        ],
        tmp_path,
        port=12431,
    )
    l0, l1 = _epoch_losses(outs[0]), _epoch_losses(outs[1])
    assert len(l0) >= 3 and l0.keys() == l1.keys(), (l0, l1, outs[0][-1500:])
    for ep in l0:
        assert l0[ep] == l1[ep], (ep, l0, l1)
    # rank 0 wrote the artifacts; rank 1 must not have clobbered them
    outdir = tmp_path / "out"
    assert (outdir / "history.jsonl").exists()
    assert (outdir / "weights.npz").exists()
    eval_json = json.loads((outdir / "eval.json").read_text())
    assert "sampling" in eval_json
    # history epochs are unique (both ranks logging would duplicate rows)
    eps = [
        json.loads(line)["epoch"]
        for line in (outdir / "history.jsonl").read_text().splitlines()
    ]
    assert len(eps) == len(set(eps))
