"""Quantify the noise-pretrain warm-start claim (VERDICT r4 missing #4).

The reference motivates conv_pre_training_cINN_on_noise.py with "early
training appears to be more stable" (its README.md:94,
conv_pre_training_cINN_on_noise.py:9-11) but never measures it. This
harness does: cold-start vs noise-pretrained warm-start on the small-arch
class workload (the run_image_parity configuration), N seeds per arm,
recording the early-window loss trajectory of the class-training phase.

Warm arm semantics mirror the reference chain (pretrain on pure N(0,1) xy
batches -> save weights -> warm-start the conv driver with a FRESH
optimizer, drivers/pretrain_noise.py -> drivers/conv.py --load): the
pretrained params seed a brand-new train state. The pretrain budget is the
reference's shape scaled to the small arch (its driver: 100 epochs x 20
batches of 512 on the flagship arch, conv_pre_training_cINN_on_noise.py:
23-28; here 30 epochs x 10 batches of 64).

Per-leg stats over the class phase: mean/max loss and epoch-to-epoch
volatility (mean |delta loss|) in the early window (epochs 1-10, the
annealing ramp) and the post-anneal window (11-20), plus the final loss.
Summary: across-seed mean/sigma per arm + a reference-side (TF) single
pair for scale. Results -> benchmarks/results/pretrain_warmstart.json.

Run: python benchmarks/pretrain_warmstart.py [seeds] [--with-ref]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")

SIZE = 8
BATCH = 64
NUM_PER_CLASS = 128
EPOCHS = 30
ANNEAL = 10
PRE_EPOCHS = 30
PRE_BATCHES = 10
LR = 3e-4
SF, NRB, NK, CARD = (0, 1), (1, 1), (16, 16), (2, 2)


def _class_stream_factory(seed):
    import jax

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )

    imgs, labels = synthetic_digits(
        num_per_class=NUM_PER_CLASS, num_classes=2, size=SIZE
    )
    src = ClassConditionalSource(imgs, labels, [0, 1], BATCH, use_logits=True)
    epoch_keys = []
    key = jax.random.PRNGKey(seed + 7)
    for _ in range(EPOCHS):
        key, k = jax.random.split(key)
        epoch_keys.append(k)

    def stream(ep):
        out = []
        for i, b in enumerate(src.epoch(epoch_keys[ep], ep)):
            b = np.asarray(b)
            a = ep / ANNEAL if ep < ANNEAL else 1.0
            if a < 1.0:
                eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
                b = (a * b + (1 - a) * eps).astype(np.float32)
            out.append(b)
        return out

    return src.xy_shape, stream


def _window_stats(losses):
    losses = np.asarray(losses, np.float64)

    def win(a):
        deltas = np.abs(np.diff(a)) if len(a) > 1 else np.asarray([0.0])
        return {
            "mean_loss": round(float(a.mean()), 2),
            "max_loss": round(float(a.max()), 2),
            "volatility": round(float(deltas.mean()), 2),
        }

    return {
        "anneal_window_1_10": win(losses[:10]),
        "clean_window_11_20": win(losses[10:20]),
        "final_loss": round(float(losses[-1]), 2),
    }


def run_ours_leg(seed, warm):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
        noise_batches,
    )

    xy_shape, stream = _class_stream_factory(seed)
    cfg = ConvFlowConfig(
        io_shape=xy_shape, x_d=1, squeeze_factor_blocks=SF, res_blocks=NRB,
        num_kernels=NK, cardinality=CARD, ksize=3,
        ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    state = create_train_state(
        model, jnp.zeros((1,) + xy_shape), LR, seed=seed
    )
    step, _ = make_step_fns(model, noise_mode="none")
    kdummy = jax.random.PRNGKey(0)
    one = jnp.float32(1.0)
    t0 = time.time()

    if warm:
        key = jax.random.PRNGKey(seed + 101)
        for ep in range(PRE_EPOCHS):
            key, k = jax.random.split(key)
            for b in noise_batches(k, PRE_BATCHES, BATCH, xy_shape):
                state, _ = step(state, b, kdummy, one)
        pre_params = state.params
        state = create_train_state(
            model, jnp.zeros((1,) + xy_shape), LR, seed=seed
        )
        state = state.replace(params=pre_params)

    losses = []
    for ep in range(EPOCHS):
        vals = []
        for b in stream(ep):
            state, out = step(state, jnp.asarray(b), kdummy, one)
            vals.append(float(out["loss"]))
        losses.append(float(np.mean(vals)))
    return losses, time.time() - t0


def run_ref_pair(seed=0):
    """One TF cold/warm pair for scale (ref-side evidence, VERDICT: 'one
    pair if cheap')."""
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()

    def build():
        tf.random.set_seed(seed)
        np.random.seed(seed)
        m = cref.cFlow(
            io_shape=[SIZE, SIZE, 2], x_d=1,
            squeeze_factor_block_list=list(SF), ResNeXt_block_list=list(NRB),
            num_kernels_list=list(NK), cardinality_list=list(CARD), ksize=3,
            init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
            LAYER_NORM=False,
        )
        var = []
        for l in m.layers_list:
            if isinstance(l, cref.coupling_layer):
                var += l.model_A.trainable_variables + l.model_b.trainable_variables
        return m, var

    xy_shape, stream = _class_stream_factory(seed)

    def train_class(m, var):
        opt = tf.keras.optimizers.Adam(LR)

        @tf.function
        def step(xy):
            with tf.GradientTape() as tape:
                loss, *_ = m.log_loss(xy)
            opt.apply_gradients(zip(tape.gradient(loss, var), var))
            return loss

        losses = []
        for ep in range(EPOCHS):
            vals = [float(step(tf.constant(b))) for b in stream(ep)]
            losses.append(float(np.mean(vals)))
        return losses

    out = {}
    for arm in ("cold", "warm"):
        m, var = build()
        if arm == "warm":
            opt = tf.keras.optimizers.Adam(LR)

            @tf.function
            def pstep(xy):
                with tf.GradientTape() as tape:
                    loss, *_ = m.log_loss(xy)
                opt.apply_gradients(zip(tape.gradient(loss, var), var))
                return loss

            rng = np.random.default_rng(seed + 101)
            for _ in range(PRE_EPOCHS):
                for _ in range(PRE_BATCHES):
                    xy = rng.normal(size=(BATCH,) + tuple(xy_shape))
                    pstep(tf.constant(xy.astype(np.float32)))
        out[arm] = _window_stats(train_class(m, var))
    return out


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    with_ref = "--with-ref" in sys.argv
    import jax

    jax.config.update("jax_platforms", "cpu")

    legs = {"cold": {}, "warm": {}}
    for seed in range(seeds):
        for arm in ("cold", "warm"):
            losses, secs = run_ours_leg(seed, warm=(arm == "warm"))
            legs[arm][f"seed{seed}"] = dict(
                _window_stats(losses), seconds=round(secs, 1),
                trajectory=[round(x, 1) for x in losses],
            )
            print(json.dumps({"arm": arm, "seed": seed,
                              **{k: v for k, v in legs[arm][f"seed{seed}"].items()
                                 if k != "trajectory"}}), flush=True)

    def summarize(arm_legs):
        keys = [
            ("anneal_window_1_10", "mean_loss"),
            ("anneal_window_1_10", "max_loss"),
            ("anneal_window_1_10", "volatility"),
            ("clean_window_11_20", "mean_loss"),
            ("clean_window_11_20", "volatility"),
        ]
        out = {}
        for w, k in keys:
            vals = [l[w][k] for l in arm_legs.values()]
            out[f"{w}.{k}"] = {
                "mean": round(float(np.mean(vals)), 2),
                "std": round(float(np.std(vals)), 2),
            }
        vals = [l["final_loss"] for l in arm_legs.values()]
        out["final_loss"] = {
            "mean": round(float(np.mean(vals)), 2),
            "std": round(float(np.std(vals)), 2),
        }
        return out

    result = {
        "config": {
            "size": SIZE, "batch": BATCH, "epochs": EPOCHS, "anneal": ANNEAL,
            "pretrain_epochs": PRE_EPOCHS, "pretrain_batches": PRE_BATCHES,
            "arch": [SF, NRB, NK, CARD], "lr": LR, "seeds": seeds,
        },
        "ours": {
            "legs": legs,
            "summary": {arm: summarize(legs[arm]) for arm in legs},
        },
    }
    if with_ref:
        result["reference_pair_seed0"] = run_ref_pair(0)
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "pretrain_warmstart.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(
        {k: v for k, v in result.items() if k != "ours"} |
        {"ours_summary": result["ours"]["summary"]}, indent=2))


if __name__ == "__main__":
    main()
