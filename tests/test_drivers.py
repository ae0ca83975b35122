"""Driver CLI smoke tests: tiny end-to-end runs of each driver."""

import json
import os

import numpy as np
import pytest


def test_build_records_and_conv_records_roundtrip(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import build_records

    out = str(tmp_path / "recs")
    written = build_records.main(
        ["--dataset", "synthetic", "--which-classes", "0", "1", "--outdir", out]
    )
    assert len(written) == 4  # 2 classes x 2 splits
    from arl_conditional_normalizing_flows_tpu.data import records

    arr = records.read_records(records.class_file(out, "train", 0), verify=True)
    assert arr.shape[1:] == (28, 28, 1)


def test_toy_driver_tiny(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import toy

    out = str(tmp_path / "toy")
    res = toy.main(
        [
            "--dataset", "crescents",
            "--coupling-blocks", "1",
            "--intermediate-dims", "8",
            "--num-layers", "1",
            "--batch-size", "64",
            "--batches-per-class", "2",
            "--epochs", "2",
            "--annealing-epochs", "1",
            "--eval-samples", "64",
            "--outdir", out,
        ]
    )
    assert os.path.exists(os.path.join(out, "weights.npz"))
    assert os.path.exists(os.path.join(out, "history.csv"))
    with open(os.path.join(out, "eval.json")) as f:
        report = json.load(f)
    assert "per_class_moments" in report
    assert np.isfinite(report["final"]["loss"])


def test_toy_driver_load_restores_mask_order(tmp_path):
    """Resuming with --load must restore the mask-order permutation SAVED
    with the weights, even under a different --seed — the reference silently
    invalidates a loaded model when the fresh random order differs
    (TOYcINN.py:228-235, SURVEY.md §5 checkpoint/resume)."""
    from arl_conditional_normalizing_flows_tpu.drivers import toy
    from arl_conditional_normalizing_flows_tpu.train import load_npz_extras

    base = [
        "--dataset", "crescents",
        "--coupling-blocks", "1",
        "--intermediate-dims", "8",
        "--num-layers", "1",
        "--batch-size", "64",
        "--batches-per-class", "2",
        "--epochs", "1",
        "--annealing-epochs", "0",
        "--eval-samples", "64",
    ]
    out1 = str(tmp_path / "run1")
    toy.main(base + ["--outdir", out1, "--seed", "0"])
    order1 = load_npz_extras(os.path.join(out1, "weights.npz"))["mask_indices"]

    out2 = str(tmp_path / "run2")
    toy.main(
        base
        + ["--outdir", out2, "--seed", "1",
           "--load", os.path.join(out1, "weights.npz")]
    )
    order2 = load_npz_extras(os.path.join(out2, "weights.npz"))["mask_indices"]
    np.testing.assert_array_equal(order1, order2)
    # sanity: a fresh seed-1 run WOULD have shuffled differently
    from arl_conditional_normalizing_flows_tpu.models import shuffle_mask_indices

    assert tuple(shuffle_mask_indices(np.random.default_rng(1), 6)) != tuple(
        order1
    )


def test_conv_driver_tiny_class(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import conv

    out = str(tmp_path / "conv")
    res = conv.main(
        [
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "2",
            "--annealing-epochs", "1",
            "--checkpoint-every", "0",
            "--outdir", out,
        ]
    )
    with open(os.path.join(out, "eval.json")) as f:
        final = json.load(f)
    assert "val_bits_per_dim" in final
    assert np.isfinite(final["loss"])


def test_conv_driver_scan_steps(tmp_path):
    """--scan-steps fuses N optimizer steps per XLA program; the run must
    train (finite loss, history rows) just like the per-batch path."""
    from arl_conditional_normalizing_flows_tpu.drivers import conv

    out = str(tmp_path / "convscan")
    conv.main(
        [
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "2",
            "--annealing-epochs", "1",
            "--checkpoint-every", "0",
            "--scan-steps", "2",
            "--outdir", out,
        ]
    )
    with open(os.path.join(out, "eval.json")) as f:
        final = json.load(f)
    assert np.isfinite(final["loss"])


def test_toy_driver_scan_steps(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import toy

    out = str(tmp_path / "toyscan")
    toy.main(
        [
            "--dataset", "crescents",
            "--coupling-blocks", "1",
            "--intermediate-dims", "8",
            "--num-layers", "1",
            "--batch-size", "64",
            "--batches-per-class", "4",
            "--epochs", "2",
            "--annealing-epochs", "1",
            "--eval-samples", "64",
            "--scan-steps", "2",
            "--outdir", out,
        ]
    )
    with open(os.path.join(out, "eval.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["final"]["loss"])


def test_epoch_stacks_groups_and_drops_remainder():
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.train import epoch_stacks

    batches = [jnp.full((4, 3), i, jnp.float32) for i in range(7)]
    stacks = list(epoch_stacks(iter(batches), 3))
    assert len(stacks) == 2  # 7 batches -> two stacks of 3, remainder dropped
    assert stacks[0].shape == (3, 4, 3)
    assert float(stacks[1][0, 0, 0]) == 3.0


def test_conv_driver_tiny_sr(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import conv

    out = str(tmp_path / "convsr")
    conv.main(
        [
            "--model-type", "SR2,1",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "1",
            "--annealing-epochs", "1",
            "--checkpoint-every", "0",
            "--outdir", out,
        ]
    )
    assert os.path.exists(os.path.join(out, "history.jsonl"))


def test_pretrain_noise_driver_tiny(tmp_path):
    from arl_conditional_normalizing_flows_tpu.drivers import pretrain_noise

    out = str(tmp_path / "noise")
    pretrain_noise.main(
        [
            "--height", "8", "--width", "8",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--num-batches", "2",
            "--batch-size", "16",
            "--epochs", "2",
            "--outdir", out,
        ]
    )
    assert os.path.exists(os.path.join(out, "conditioned_weights.npz"))


def test_conv_driver_warm_start_from_pretrain(tmp_path):
    """The pre-training -> training hand-off (README.md:92-98): conv driver
    loads the noise-pretrained weights npz."""
    from arl_conditional_normalizing_flows_tpu.drivers import conv, pretrain_noise

    noise_out = str(tmp_path / "noise")
    pretrain_noise.main(
        [
            "--height", "28", "--width", "28",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--num-batches", "1",
            "--batch-size", "8",
            "--epochs", "1",
            "--outdir", noise_out,
        ]
    )
    out = str(tmp_path / "conv")
    conv.main(
        [
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "1",
            "--annealing-epochs", "0",
            "--checkpoint-every", "0",
            "--load", os.path.join(noise_out, "conditioned_weights.npz"),
            "--outdir", out,
        ]
    )
    assert os.path.exists(os.path.join(out, "eval.json"))

    # arch-contract enforcement (the reference's filename encoding,
    # conv_pre_training_cINN_on_noise.py:47-48): conv params are
    # spatial-size-independent, so 14x14-pretrained weights have IDENTICAL
    # shapes to the 28x28 arch and would previously load silently
    noise14 = str(tmp_path / "noise14")
    pretrain_noise.main(
        [
            "--height", "14", "--width", "14",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--num-batches", "1",
            "--batch-size", "8",
            "--epochs", "1",
            "--outdir", noise14,
        ]
    )
    import pytest

    with pytest.raises(AssertionError, match="arch"):
        conv.main(
            [
                "--model-type", "class",
                "--dataset", "synthetic", "--synthetic-per-class", "64",
                "--data-classes", "0", "1",
                "--squeeze-factor", "0", "1",
                "--res-blocks", "1", "1",
                "--kernels", "16", "16",
                "--cardinality", "2", "2",
                "--batch-size", "16",
                "--epochs", "1",
                "--annealing-epochs", "0",
                "--checkpoint-every", "0",
                "--load", os.path.join(noise14, "conditioned_weights.npz"),
                "--outdir", str(tmp_path / "conv_mismatch"),
            ]
        )


def test_toy_driver_continuous_sectors(tmp_path):
    """The continuous-condition path (ds=None branch): trains on freshly
    generated sector batches (TOYcINN_make_datasets.py:1114-1205)."""
    from arl_conditional_normalizing_flows_tpu.drivers import toy

    out = str(tmp_path / "sectors")
    toy.main(
        [
            "--dataset", "continuous_sectors",
            "--coupling-blocks", "1",
            "--intermediate-dims", "8",
            "--num-layers", "1",
            "--batch-size", "64",
            "--batches-per-class", "2",
            "--epochs", "2",
            "--annealing-epochs", "0",
            "--eval-samples", "32",
            "--outdir", out,
        ]
    )
    import json, os

    with open(os.path.join(out, "eval.json")) as f:
        report = json.load(f)
    assert "per_class_moments" not in report  # continuous: no class sweep
    import numpy as np

    assert np.isfinite(report["final"]["loss"])


def test_cnf_eval_on_checkpoint(tmp_path):
    """Train tiny -> evaluate the checkpoint standalone (cnf-eval)."""
    from arl_conditional_normalizing_flows_tpu.drivers import conv, evaluate

    out = str(tmp_path / "train")
    conv.main(
        [
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "1",
            "--annealing-epochs", "0",
            "--checkpoint-every", "0",
            "--outdir", out,
        ]
    )
    artifact = str(tmp_path / "sampler.shlo")
    report = evaluate.main(
        [
            "--checkpoint-dir", os.path.join(out, "checkpoints"),
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--batch-size", "16",
            "--eval-samples", "8",
            "--export-sampler", artifact,
            "--export-multidraw", artifact + ".multi",
        ]
    )
    assert np.isfinite(report["bits_per_dim"])
    assert "latent_normality" in report and "sampling" in report

    # the exported serving artifact loads and samples (symbolic batch)
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.serve import load_artifact

    loaded = load_artifact(artifact)
    x = loaded.call(jnp.zeros((3, 28, 28, 1)), jnp.full((3, 28, 28, 1), 0.5))
    assert x.shape == (3, 28, 28, 1) and np.isfinite(np.asarray(x)).all()

    # and the multidraw artifact serves (d, b) fan-out from one call
    multi = load_artifact(artifact + ".multi")
    xm = multi.call(
        jnp.zeros((2, 3, 28, 28, 1)), jnp.full((3, 28, 28, 1), 0.5)
    )
    assert xm.shape == (2, 3, 28, 28, 1)
    np.testing.assert_allclose(np.asarray(xm[0]), np.asarray(x), rtol=1e-6, atol=1e-6)


def test_conv_driver_data_parallel(tmp_path):
    """--data-parallel path: mesh creation + sharded batches through fit."""
    from arl_conditional_normalizing_flows_tpu.drivers import conv

    out = str(tmp_path / "dp")
    conv.main(
        [
            "--model-type", "class",
            "--dataset", "synthetic", "--synthetic-per-class", "64",
            "--data-classes", "0", "1",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "16", "16",
            "--cardinality", "2", "2",
            "--batch-size", "16",
            "--epochs", "1",
            "--annealing-epochs", "0",
            "--checkpoint-every", "0",
            "--data-parallel",
            "--outdir", out,
        ]
    )
    with open(os.path.join(out, "eval.json")) as f:
        final = json.load(f)
    assert np.isfinite(final["loss"])


def test_build_records_tfrecords_sidecar(tmp_path):
    """--tfrecords writes reference-format files our reader round-trips."""
    from arl_conditional_normalizing_flows_tpu.data import tfrecord_compat as tfc
    from arl_conditional_normalizing_flows_tpu.drivers import build_records

    out = str(tmp_path / "recs")
    build_records.main(
        ["--dataset", "synthetic", "--which-classes", "0", "1",
         "--outdir", out, "--no-verify", "--tfrecords"]
    )
    path = os.path.join(out, "x_train_synthetic_c0.tfrecords")
    assert os.path.exists(path)
    imgs, labels = tfc.read_reference_tfrecords(path, verify=True)
    assert imgs.shape[1:] == (28, 28, 1) and labels.shape[1] == 10
    assert (labels[:, 0] == 1).all()  # class-0 file: one-hot index 0
    assert os.path.exists(os.path.join(out, "x_val_synthetic_c1.tfrecords"))


def test_conv_driver_streaming_records(tmp_path):
    """cnf-conv --records-dir streams batches through the native loader by
    default (bounded memory, VERDICT round-1 item 5) and trains end to end."""
    import json

    from arl_conditional_normalizing_flows_tpu.drivers import build_records, conv

    recs = str(tmp_path / "recs")
    build_records.main(
        ["--dataset", "synthetic", "--which-classes", "0", "1",
         "--outdir", recs]
    )
    out = str(tmp_path / "run")
    conv.main(
        [
            "--records-dir", recs,
            "--data-classes", "0", "1",
            "--batch-size", "16",
            "--epochs", "1",
            "--annealing-epochs", "0",
            "--no-dilations",
            "--squeeze-factor", "0", "1",
            "--res-blocks", "1", "1",
            "--kernels", "8", "8",
            "--cardinality", "2", "2",
            "--eval-samples", "4",
            "--checkpoint-every", "0",
            "--outdir", out,
        ]
    )
    ev = json.loads((tmp_path / "run" / "eval.json").read_text())
    assert "sampling" in ev and "loss" in ev


def test_toy_driver_sectors_eval_metrics(tmp_path):
    """continuous_sectors runs must emit the per-sector conditional-fidelity
    metrics (angular error / in-sector fraction) in eval.json."""
    from arl_conditional_normalizing_flows_tpu.drivers import toy

    out = str(tmp_path / "sectors")
    toy.main(
        [
            "--dataset", "continuous_sectors",
            "--coupling-blocks", "1",
            "--intermediate-dims", "8",
            "--num-layers", "1",
            "--batch-size", "64",
            "--batches-per-class", "2",
            "--epochs", "2",
            "--annealing-epochs", "0",
            "--eval-samples", "64",
            "--outdir", out,
        ]
    )
    with open(os.path.join(out, "eval.json")) as f:
        report = json.load(f)
    assert len(report["per_sector"]) == 8
    agg = report["sector_aggregate"]
    assert 0.0 <= agg["frac_in_sector"] <= 1.0
    assert np.isfinite(agg["mean_abs_angular_error"])
