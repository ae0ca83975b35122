"""TF-free reference-checkpoint importer (convert/reference_import.py,
VERDICT round-1 item 4).

Round-trip criterion: import -> encode matches the live reference model to
float32 noise (the same bar as the in-memory transplant harnesses,
PARITY.md §1-2). The TF-dependent parts generate the FILES only; the import
path itself touches h5py/numpy exclusively.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arl_conditional_normalizing_flows_tpu.convert import (
    parse_conv_filename,
    parse_toy_filename,
)

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
)
sys.path.insert(0, BENCH)


def _reference_or_skip():
    tf = pytest.importorskip("tensorflow")
    from reference_shim import reference_available

    if not reference_available():
        pytest.skip("reference checkout unavailable")
    return tf


# ---------------------------------------------------------------------------
# filename-convention parsing (no TF)
# ---------------------------------------------------------------------------


def test_parse_conv_filename_flagship():
    kw = parse_conv_filename(
        "weights_class_mnist_28x28x2_SqFa0100_NRB3333_C8844_NK64643232"
        "_KS3_D124_LNTrue.h5"
    )
    assert kw["io_shape"] == (28, 28, 2)
    assert kw["squeeze_factor_blocks"] == (0, 1, 0, 0)
    assert kw["res_blocks"] == (3, 3, 3, 3)
    assert kw["cardinality"] == (8, 8, 4, 4)
    assert kw["num_kernels"] == (64, 64, 32, 32)
    assert kw["ksize"] == 3 and kw["dilations"] is True
    assert kw["layer_norm"] is True


def test_parse_conv_filename_checkpoint_variant():
    kw = parse_conv_filename(
        "checkpoint_SR2,1_fashion_mnist_28x28x2_SqFa0100_NRB3333_C8844"
        "_NK64643232_KS3_D124_LNFalse.e40.hdf5"
    )
    assert kw["layer_norm"] is False
    assert kw["num_kernels"] == (64, 64, 32, 32)


def test_parse_toy_filename():
    kw = parse_toy_filename("weights_crescents_NCL24_ID32_NL6.npy")
    assert kw == dict(num_coupling_layers=24, intermediate_dims=32, num_layers=6)


# ---------------------------------------------------------------------------
# conv round trip (Keras 3 file written by the shimmed reference)
# ---------------------------------------------------------------------------


def _build_small_ref_conv(tf, layer_norm=True, seed=0):
    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=[8, 8, 2], x_d=1, squeeze_factor_block_list=[0, 1],
        ResNeXt_block_list=[1, 1], num_kernels_list=[16, 16],
        cardinality_list=[2, 2], ksize=3,
        init=tf.keras.initializers.Orthogonal(0.3), DILATIONS=True,
        LAYER_NORM=layer_norm,
    )
    _ = m.call(tf.constant(np.zeros((1, 8, 8, 2), np.float32)), 1)
    return m


def _small_cfg(layer_norm=True):
    from arl_conditional_normalizing_flows_tpu.models import ConvFlowConfig

    return ConvFlowConfig(
        io_shape=(8, 8, 2), x_d=1, squeeze_factor_blocks=(0, 1),
        res_blocks=(1, 1), num_kernels=(16, 16), cardinality=(2, 2), ksize=3,
        layer_norm=layer_norm, ref_compat_group_slice=True,
    )


def test_conv_h5_import_round_trip(tmp_path):
    tf = _reference_or_skip()
    from arl_conditional_normalizing_flows_tpu.convert import import_conv_h5
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow

    m = _build_small_ref_conv(tf)
    path = str(tmp_path / "ref.weights.h5")
    m.built = True
    m.save_weights(path)

    cfg = _small_cfg()
    params = import_conv_h5(path, cfg)
    ours = ConvCFlow(cfg)
    xy = np.random.default_rng(42).normal(size=(4, 8, 8, 2)).astype(np.float32)
    zy_ref, ld_ref = m.call(tf.constant(xy), 1)
    zy_ours, ld_ours = ours.apply(params, jnp.asarray(xy))
    assert np.abs(np.asarray(zy_ref) - np.asarray(zy_ours)).max() < 1e-4
    assert abs(float(ld_ref) - float(np.mean(np.asarray(ld_ours)))) < 1e-3
    # decode too: the imported model must invert like the reference
    back = np.asarray(ours.apply(params, zy_ours, method="inverse"))
    assert np.abs(back - xy).max() < 1e-4


def test_conv_h5_import_wrong_arch_fails_loudly(tmp_path):
    tf = _reference_or_skip()
    from arl_conditional_normalizing_flows_tpu.convert import import_conv_h5
    import dataclasses

    m = _build_small_ref_conv(tf)
    path = str(tmp_path / "ref.weights.h5")
    m.built = True
    m.save_weights(path)
    bad = dataclasses.replace(_small_cfg(), num_kernels=(8, 8))
    with pytest.raises(AssertionError):
        import_conv_h5(path, bad)


def test_conv_keras2_layout_import(tmp_path):
    """The TF2/Keras-2 flat HDF5 layout (what real reference users hold):
    reconstructed from the same live model's weights, must import to the
    IDENTICAL parameter tree as the Keras-3 file."""
    tf = _reference_or_skip()
    import h5py

    from reference_shim import import_conv_reference
    from arl_conditional_normalizing_flows_tpu.convert import import_conv_h5

    cref = import_conv_reference()
    m = _build_small_ref_conv(tf)
    k3_path = str(tmp_path / "ref.weights.h5")
    m.built = True
    m.save_weights(k3_path)

    # Keras-2 style: root attr layer_names; one group per top-level layer;
    # weight_names = full variable paths in creation order
    k2_path = str(tmp_path / "ref_k2.h5")
    couplings = [
        l for l in m.layers_list if isinstance(l, cref.coupling_layer)
    ]
    with h5py.File(k2_path, "w") as f:
        layer_names = []
        gidx = {"conv": 0, "ln": 0, "ts": 0}
        for ci, cl in enumerate(couplings):
            lname = "coupling_layer" if ci == 0 else f"coupling_layer_{ci}"
            layer_names.append(lname)
            g = f.create_group(lname)
            wnames = []
            for side, sub in (("model_b", cl.model_b), ("model_A", cl.model_A)):
                for layer in sub.layers:
                    cls = layer.__class__.__name__
                    ws = layer.get_weights()
                    if not ws:
                        continue
                    if cls in ("Conv2D", "Convolution2D"):
                        i = gidx["conv"]
                        nm = "conv2d" if i == 0 else f"conv2d_{i}"
                        gidx["conv"] += 1
                        kinds = ["kernel", "bias"]
                    elif cls == "LayerNormalization":
                        i = gidx["ln"]
                        nm = (
                            "layer_normalization"
                            if i == 0
                            else f"layer_normalization_{i}"
                        )
                        gidx["ln"] += 1
                        kinds = ["gamma", "beta"]
                    elif cls == "tanh_scaling_layer":
                        i = gidx["ts"]
                        nm = (
                            "tanh_scaling_layer"
                            if i == 0
                            else f"tanh_scaling_layer_{i}"
                        )
                        gidx["ts"] += 1
                        kinds = ["scale"]
                    else:
                        continue
                    for w, kind in zip(ws, kinds):
                        full = f"{lname}/{side}/{nm}/{kind}:0"
                        g.create_dataset(full, data=np.asarray(w))
                        wnames.append(full.encode())
            g.attrs["weight_names"] = wnames
        f.attrs["layer_names"] = [n.encode() for n in layer_names]

    cfg = _small_cfg()
    p2 = import_conv_h5(k2_path, cfg)
    p3 = import_conv_h5(k3_path, cfg)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    flat3 = dict(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(p3)
    )
    for kp, leaf in flat2:
        assert np.array_equal(leaf, flat3[jax.tree_util.keystr(kp)]), (
            jax.tree_util.keystr(kp)
        )


# ---------------------------------------------------------------------------
# toy round trip
# ---------------------------------------------------------------------------


def test_toy_npy_import_round_trip(tmp_path):
    tf = _reference_or_skip()
    from reference_shim import import_toy_reference
    from arl_conditional_normalizing_flows_tpu.convert import import_toy_npy
    from arl_conditional_normalizing_flows_tpu.models import ToyCINN

    ref = import_toy_reference()
    tf.random.set_seed(0)
    np.random.seed(0)
    m = ref.cINN_affine(3, 2, 12, 16, 2, tf.keras.initializers.Orthogonal(0.1), None)
    xy = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    _ = m.call(tf.constant(xy), -1)  # build

    wpath = str(tmp_path / "weights_crescents_NCL12_ID16_NL2.npy")
    mpath = str(tmp_path / "mask_indices_crescents_NCL12_ID16_NL2.npy")
    arr = np.array(
        [m.coupling_layers_list[i].get_weights() for i in range(12)],
        dtype=object,
    )
    np.save(wpath, arr)
    np.save(mpath, np.asarray(m.mask_indices))

    params, mask_indices, cfg = import_toy_npy(wpath, mpath)
    assert cfg.num_coupling_layers == 12
    assert cfg.intermediate_dims == 16 and cfg.num_layers == 2
    assert mask_indices == tuple(int(i) for i in m.mask_indices)

    ours = ToyCINN(cfg)
    zy_ref, ld_ref = m.call(tf.constant(xy), -1)
    zy_ours, ld_ours = ours.apply(params, jnp.asarray(xy))
    assert np.abs(np.asarray(zy_ref) - np.asarray(zy_ours)).max() < 1e-5
    assert np.abs(np.asarray(ld_ref) - np.asarray(ld_ours)).max() < 1e-5


# ---------------------------------------------------------------------------
# CLI end to end
# ---------------------------------------------------------------------------


def test_import_cli_conv_and_load(tmp_path):
    tf = _reference_or_skip()
    from arl_conditional_normalizing_flows_tpu.drivers import import_reference
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        arch_string,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        load_npz_extras,
        load_params_npz,
    )

    m = _build_small_ref_conv(tf, layer_norm=False)
    # the reference filename convention carries the arch
    name = "weights_class_mnist_8x8x2_SqFa01_NRB11_C22_NK1616_KS3_D12_LNFalse.weights.h5"
    path = str(tmp_path / name)
    m.built = True
    m.save_weights(path)
    out = import_reference.main(
        ["conv", "--weights", path, "--output", str(tmp_path / "imported.npz")]
    )
    extras = load_npz_extras(out)
    cfg = _small_cfg(layer_norm=False)
    assert str(extras["arch"]) == arch_string(cfg)
    ours = ConvCFlow(cfg)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    params = load_params_npz(out, template)
    xy = np.random.default_rng(7).normal(size=(2, 8, 8, 2)).astype(np.float32)
    zy_ref, _ = m.call(tf.constant(xy), 1)
    zy_ours, _ = ours.apply(params, jnp.asarray(xy))
    assert np.abs(np.asarray(zy_ref) - np.asarray(zy_ours)).max() < 1e-4
