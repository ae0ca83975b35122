"""Conv-model parity harness: weight-transplant equivalence against the
UNMODIFIED reference ``cFlow`` (conv_cINN_make_model.py).

Builds the reference multi-scale conv flow under the local TF stack (see
reference_shim), copies every coupling subnet's weights into our
``ConvCFlow`` parameter tree — reference per-group Conv2D kernels concatenate
along the output axis into our single ``feature_group_count`` conv — and
compares encode / log-det / decode / loss components on one batch.

Run: python benchmarks/parity_conv.py [small|default]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def _conv_layers_in_creation_order(keras_model):
    convs = [l for l in keras_model.layers if l.__class__.__name__ in ("Conv2D", "Convolution2D")]

    def order_key(l):
        parts = l.name.rsplit("_", 1)
        return int(parts[1]) if len(parts) == 2 and parts[1].isdigit() else -1

    return sorted(convs, key=order_key)


def _map_subnet(ref_model, our_params, cardinality, dilations, has_scale):
    """Map one reference coupling sub-Model (model_A or model_b) onto our
    ConvCouplingNet param subtree (creation order: trunk; per res block
    [1x1-in, per-dilation cardinality group convs, 1x1-out]; head; scale)."""
    import jax.numpy as jnp

    convs = _conv_layers_in_creation_order(ref_model)
    out = dict(our_params)
    i = 0

    def take():
        nonlocal i
        k, b = convs[i].get_weights()
        i += 1
        return jnp.asarray(k), jnp.asarray(b)

    def put(path_dict, key, k, b):
        assert path_dict[key]["kernel"].shape == k.shape, (
            key, path_dict[key]["kernel"].shape, k.shape)
        path_dict[key] = {"kernel": k, "bias": b}

    # trunk
    k, b = take()
    put(out, "Conv_0", k, b)
    # res blocks
    n_blocks = sum(1 for key in our_params if key.startswith("DilatedResidualBlock"))
    for blk in range(n_blocks):
        bkey = f"DilatedResidualBlock_{blk}"
        bparams = dict(out[bkey])
        k, b = take()
        put(bparams, "Conv_0", k, b)
        for di, d in enumerate(dilations):
            gk, gb = [], []
            for _ in range(cardinality):
                kk, bb = take()
                gk.append(kk)
                gb.append(bb)
            put(
                bparams,
                f"Conv_{1 + di}",
                jnp.concatenate(gk, axis=-1),
                jnp.concatenate(gb, axis=-1),
            )
        k, b = take()
        put(bparams, f"Conv_{1 + len(dilations)}", k, b)
        out[bkey] = bparams
    # head
    k, b = take()
    put(out, "Conv_1", k, b)
    assert i == len(convs), (i, len(convs))
    if has_scale:
        # tanh_scaling_layer scalar (conv_cINN_make_model.py:107-116)
        scale = None
        for l in ref_model.layers:
            if l.__class__.__name__ == "tanh_scaling_layer":
                scale = l.get_weights()[0]
        assert scale is not None
        out["tanh_scale"] = jnp.asarray(scale).reshape(())
    return out


def transplant(size="small", batch=4, seed=0):
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()

    if size == "small":
        io_shape, sf, nrb, nk, card = [8, 8, 2], [0, 1], [1, 1], [16, 16], [2, 2]
    else:
        io_shape, sf, nrb, nk, card = (
            [28, 28, 2], [0, 1, 0, 0], [3, 3, 3, 3], [64, 64, 32, 32], [8, 8, 4, 4],
        )

    tf.random.set_seed(seed)
    np.random.seed(seed)
    ref_model = cref.cFlow(
        io_shape=io_shape,
        x_d=1,
        squeeze_factor_block_list=sf,
        ResNeXt_block_list=nrb,
        num_kernels_list=nk,
        cardinality_list=card,
        ksize=3,
        init=tf.keras.initializers.Orthogonal(0.5),
        DILATIONS=True,
        LAYER_NORM=False,
    )

    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig

    cfg = ConvFlowConfig(
        io_shape=tuple(io_shape),
        x_d=1,
        squeeze_factor_blocks=tuple(sf),
        res_blocks=tuple(nrb),
        num_kernels=tuple(nk),
        cardinality=tuple(card),
        ksize=3,
        # match the reference's actual runtime grouped-conv behavior (its
        # Lambda group slices late-bind the loop variable)
        ref_compat_group_slice=True,
    )
    ours = ConvCFlow(cfg)
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1,) + cfg.io_shape))
    p = dict(params["params"])

    ref_couplings = [
        l for l in ref_model.layers_list if isinstance(l, cref.coupling_layer)
    ]
    n = len(ref_couplings)
    for j, rc in enumerate(ref_couplings):
        ours_layer = dict(p[f"couplings_{j}"])
        dil = tuple(int(d) for d in rc.which_dilations)
        ours_layer["net_a"] = _map_subnet(
            rc.model_A, ours_layer["net_a"], rc.cardinality, dil, has_scale=True
        )
        ours_layer["net_b"] = _map_subnet(
            rc.model_b, ours_layer["net_b"], rc.cardinality, dil, has_scale=False
        )
        p[f"couplings_{j}"] = ours_layer
    params = {"params": p}

    rng = np.random.default_rng(42)
    xy = rng.normal(size=(batch,) + tuple(io_shape)).astype(np.float32)

    zy_ref, ld_ref = ref_model.call(tf.constant(xy), 1)
    zy_ref = np.asarray(zy_ref)
    ld_ref = float(ld_ref)  # reference batch-averages the log-det
    zy_ours, ld_ours = ours.apply(params, jnp.asarray(xy))
    ld_ours_mean = float(np.mean(np.asarray(ld_ours)))

    back_ref = np.asarray(ref_model.call(tf.constant(zy_ref), -1))
    back_ours = np.asarray(ours.apply(params, zy_ours, method="inverse"))

    ref_loss = [float(x) for x in ref_model.log_loss(tf.constant(xy))]
    ours_loss = {
        k: float(v)
        for k, v in ours.apply(params, jnp.asarray(xy), method="log_loss").items()
    }

    out = {
        "config": {"size": size, "io_shape": io_shape, "n_couplings": n, "batch": batch},
        "encode_max_abs_diff": float(np.abs(zy_ref - np.asarray(zy_ours)).max()),
        "logdet_batchmean_abs_diff": abs(ld_ref - ld_ours_mean),
        "decode_max_abs_diff": float(np.abs(back_ref - back_ours).max()),
        "loss_components_ref": dict(
            zip(["loss", "z_loss", "y_loss", "detJ_loss"], ref_loss)
        ),
        "loss_components_ours": ours_loss,
    }
    out["loss_max_abs_diff"] = max(
        abs(out["loss_components_ref"][k] - out["loss_components_ours"][k])
        for k in out["loss_components_ref"]
    )
    return out


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    os.makedirs(RESULTS_DIR, exist_ok=True)
    from reference_shim import reference_available

    if not reference_available():
        print("reference checkout not available; skipping")
        return
    import jax

    jax.config.update("jax_platforms", "cpu")  # full f32 (see parity_toy)
    out = transplant(size)
    with open(os.path.join(RESULTS_DIR, f"conv_transplant_{size}.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
