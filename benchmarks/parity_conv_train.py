"""Conv-model matched-budget training parity on the noise pre-training task.

Both implementations train a small conv cFlow on pure N(0,1) xy data
(the conv_pre_training_cINN_on_noise.py objective — data distribution is
identical by construction, so final losses are directly comparable), same
arch / Adam lr / batch size / epoch budget.

Run: python benchmarks/parity_conv_train.py [epochs] [impl: ours|reference|all]
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

IO_SHAPE = (8, 8, 2)
SF, NRB, NK, CARD = (0, 1), (1, 1), (16, 16), (2, 2)
BATCH = 64
BATCHES_PER_EPOCH = 10
LR = 3e-4


def run_ours(epochs, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        fit,
        make_step_fns,
        noise_batches,
    )

    cfg = ConvFlowConfig(
        io_shape=IO_SHAPE, x_d=1, squeeze_factor_blocks=SF, res_blocks=NRB,
        num_kernels=NK, cardinality=CARD, ksize=3,
        # compare against what the reference ACTUALLY computes
        ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    state = create_train_state(model, jnp.zeros((1,) + IO_SHAPE), LR, seed=seed)
    step, _ = make_step_fns(model, noise_mode="none")
    t0 = time.time()
    res = fit(
        state, step,
        lambda k, e: noise_batches(k, BATCHES_PER_EPOCH, BATCH, IO_SHAPE),
        key=jax.random.PRNGKey(seed + 1), num_epochs=epochs, patience=None,
        verbose=False,
    )
    rows = res.history.rows
    return {
        "impl": "ours",
        "epochs": epochs,
        "seconds": round(time.time() - t0, 1),
        "final_loss": round(rows[-1]["loss"], 3),
        "best_loss": round(min(r["loss"] for r in rows), 3),
        "final_components": {
            k: round(rows[-1][k], 3) for k in ("z_loss", "y_loss", "detJ_loss")
        },
    }


def run_reference(epochs, seed=0):
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=list(IO_SHAPE), x_d=1, squeeze_factor_block_list=list(SF),
        ResNeXt_block_list=list(NRB), num_kernels_list=list(NK),
        cardinality_list=list(CARD), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=False,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables

    @tf.function
    def step(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss, lz, ly, ldj

    rng = np.random.default_rng(seed + 1)
    hist = []
    t0 = time.time()
    for ep in range(epochs):
        losses = []
        for _ in range(BATCHES_PER_EPOCH):
            xy = rng.normal(size=(BATCH,) + IO_SHAPE).astype(np.float32)
            losses.append([float(x) for x in step(tf.constant(xy))])
        hist.append(np.mean(losses, axis=0))
    hist = np.asarray(hist)
    return {
        "impl": "reference",
        "epochs": epochs,
        "seconds": round(time.time() - t0, 1),
        "final_loss": round(float(hist[-1, 0]), 3),
        "best_loss": round(float(hist[:, 0].min()), 3),
        "final_components": {
            "z_loss": round(float(hist[-1, 1]), 3),
            "y_loss": round(float(hist[-1, 2]), 3),
            "detJ_loss": round(float(hist[-1, 3]), 3),
        },
    }



def run_image_parity(epochs=40, seed=0, size=8, anneal=10, arch=None,
                     batch=None, layer_norm=False, num_per_class=128):
    """Matched-budget CLASS-CONDITIONAL image training on identical data:
    synthetic digits (2 classes), logit transform, label plane, class-pure
    batches, 2% noise floor — the full C19 pipeline semantics — trained by
    both implementations on the byte-identical batch stream.

    ``anneal=100, epochs=600`` reproduces the reference driver's FULL budget
    (conv_cINN.py:116 num_annealing_epochs=100 + :119 num_epochs=500).
    ``arch=(sf, nrb, nk, card)`` overrides the small default; pass the
    reference driver's flagship lists (conv_cINN.py:56-65) with ``size=28``,
    ``batch=32``, ``layer_norm=True`` for flagship-arch parity."""
    sf, nrb, nk, card = arch if arch is not None else (SF, NRB, NK, CARD)
    batch = batch if batch is not None else BATCH
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        fit,
        make_step_fns,
    )

    imgs, labels = synthetic_digits(num_per_class=num_per_class, num_classes=2,
                                    size=size)
    src = ClassConditionalSource(imgs, labels, [0, 1], batch, use_logits=True)
    h, w, xy_d = src.xy_shape

    # the SAME epoch batch streams feed both implementations: src.epoch is
    # fully determined by (key, epoch), so regenerate per epoch from a fixed
    # key chain instead of materializing the whole run's batches up front
    # (600 flagship epochs would hold ~0.5 GB resident for hours)
    epoch_keys = []
    key = jax.random.PRNGKey(seed + 7)
    for ep in range(epochs):
        key, k = jax.random.split(key)
        epoch_keys.append(k)

    def stream(ep):
        return [np.asarray(b) for b in src.epoch(epoch_keys[ep], ep)]

    anneal = int(anneal)

    def alpha_of(ep):
        return ep / anneal if ep < anneal else 1.0

    def noisy(ep, i, b):
        a = alpha_of(ep)
        if a >= 1.0:
            return b
        eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
        return (a * b + (1 - a) * eps).astype(np.float32)

    # ---- reference --------------------------------------------------------
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=[h, w, xy_d], x_d=1, squeeze_factor_block_list=list(sf),
        ResNeXt_block_list=list(nrb), num_kernels_list=list(nk),
        cardinality_list=list(card), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=layer_norm,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables

    @tf.function
    def rstep(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss, lz, ly, ldj

    t0 = time.time()
    ref_hist = []
    for ep in range(epochs):
        losses = [
            [float(x) for x in rstep(tf.constant(noisy(ep, i, b)))]
            for i, b in enumerate(stream(ep))
        ]
        ref_hist.append(np.mean(losses, axis=0))
    ref_secs = time.time() - t0
    ref_hist = np.asarray(ref_hist)

    # ---- ours (ref-compat grouped conv, identical batches) ---------------
    cfg = ConvFlowConfig(
        io_shape=(h, w, xy_d), x_d=1, squeeze_factor_blocks=sf, res_blocks=nrb,
        num_kernels=nk, cardinality=card, ksize=3, layer_norm=layer_norm,
        ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    state = create_train_state(model, jnp.zeros((1, h, w, xy_d)), LR, seed=seed)
    step, _ = make_step_fns(model, noise_mode="none")
    t0 = time.time()
    ours_hist = []
    kdummy = jax.random.PRNGKey(0)
    for ep in range(epochs):
        vals = []
        for i, b in enumerate(stream(ep)):
            state, out = step(state, jnp.asarray(noisy(ep, i, b)), kdummy,
                              jnp.float32(1.0))
            vals.append([float(out[k]) for k in ("loss", "z_loss", "y_loss", "detJ_loss")])
        ours_hist.append(np.mean(vals, axis=0))
    ours_secs = time.time() - t0
    ours_hist = np.asarray(ours_hist)

    names = ["loss", "z_loss", "y_loss", "detJ_loss"]
    # loss trajectory at checkpoints so convergence ALIGNMENT (not just the
    # endpoint) is part of the parity record
    marks = sorted({min(e, epochs - 1) for e in (0, 9, 49, 99, 149, 299, 449, epochs - 1)})
    return {
        "task": f"class-conditional {size}x{size} synthetic, identical batches",
        "epochs": epochs,
        "annealing_epochs": anneal,
        "loss_trajectory_epochs": [m + 1 for m in marks],
        "reference": {
            "final": dict(zip(names, np.round(ref_hist[-1], 3).tolist())),
            "best_loss": round(float(ref_hist[:, 0].min()), 3),
            "loss_trajectory": np.round(ref_hist[marks, 0], 2).tolist(),
            "seconds": round(ref_secs, 1),
        },
        "ours": {
            "final": dict(zip(names, np.round(ours_hist[-1], 3).tolist())),
            "best_loss": round(float(ours_hist[:, 0].min()), 3),
            "loss_trajectory": np.round(ours_hist[marks, 0], 2).tolist(),
            "seconds": round(ours_secs, 1),
        },
    }


def run_image_sample_parity(epochs=80, seed=0, size=8, num_samples=4000):
    """Conditional-sample MOMENT parity for an IMAGE model (the conv analogue
    of parity_toy.py sample_parity): train the reference small conv cFlow on
    class-conditional synthetic digits, transplant the TRAINED weights into
    our ConvCFlow, then draw ``num_samples`` conditional samples per class
    through BOTH inverse paths (reference: squeeze/factor re-flatten then all
    layers backward, conv_cINN_make_model.py:1774-1798; ours: the same
    semantics via ConvCFlow.sample_xy). With identical weights the two
    samplers target the identical distribution, so per-pixel sample moments
    must agree within Monte-Carlo standard error."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from parity_conv import _map_subnet
    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        class_labels_01,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.sample import (
        sample_conditional_images,
    )

    imgs, labels = synthetic_digits(num_per_class=128, num_classes=2, size=size)
    src = ClassConditionalSource(imgs, labels, [0, 1], BATCH, use_logits=True)
    h, w, xy_d = src.xy_shape
    label_values = class_labels_01(2)

    # ---- train the reference ---------------------------------------------
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=[h, w, xy_d], x_d=1, squeeze_factor_block_list=list(SF),
        ResNeXt_block_list=list(NRB), num_kernels_list=list(NK),
        cardinality_list=list(CARD), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=False,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables

    @tf.function
    def rstep(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss

    key = jax.random.PRNGKey(seed + 7)
    t0 = time.time()
    final = None
    for ep in range(epochs):
        a = min(ep / 10.0, 1.0)  # annealing ramp (conv_cINN.py:589-628)
        losses = []
        for i, b in enumerate(src.epoch(jax.random.fold_in(key, ep), ep)):
            b = np.asarray(b)
            if a < 1.0:
                eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
                b = (a * b + (1 - a) * eps).astype(np.float32)
            losses.append(float(rstep(tf.constant(b))))
        final = float(np.mean(losses))
    train_secs = time.time() - t0

    # ---- transplant trained weights into our model ------------------------
    cfg = ConvFlowConfig(
        io_shape=(h, w, xy_d), x_d=1, squeeze_factor_blocks=SF, res_blocks=NRB,
        num_kernels=NK, cardinality=CARD, ksize=3, ref_compat_group_slice=True,
    )
    ours = ConvCFlow(cfg)
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, xy_d)))
    p = dict(params["params"])
    ref_couplings = [
        l for l in m.layers_list if isinstance(l, cref.coupling_layer)
    ]
    for j, rc in enumerate(ref_couplings):
        layer = dict(p[f"couplings_{j}"])
        dil = tuple(int(d) for d in rc.which_dilations)
        layer["net_a"] = _map_subnet(
            rc.model_A, layer["net_a"], rc.cardinality, dil, has_scale=True
        )
        layer["net_b"] = _map_subnet(
            rc.model_b, layer["net_b"], rc.cardinality, dil, has_scale=False
        )
        p[f"couplings_{j}"] = layer
    params = {"params": p}

    # sanity: encode parity on one batch of real data
    xy_check = np.asarray(next(iter(src.epoch(key, 0))))
    zy_ref, _ = m.call(tf.constant(xy_check), 1)
    zy_ours, _ = ours.apply(params, jnp.asarray(xy_check))
    encode_diff = float(np.abs(np.asarray(zy_ref) - np.asarray(zy_ours)).max())

    # ---- sample both paths per class --------------------------------------
    per_class = {}
    for ci, lab in enumerate(label_values):
        rng = np.random.default_rng(1000 + ci)
        z = rng.normal(size=(num_samples, h, w, 1)).astype(np.float32)
        yplane = np.full((num_samples, h, w, 1), lab, np.float32)
        xy_ref = np.asarray(m.call(tf.constant(np.concatenate([z, yplane], -1)), -1))
        x_ref, y_ref = xy_ref[..., :1], xy_ref[..., 1:]

        x_ours = np.asarray(
            sample_conditional_images(
                ours, params, jax.random.PRNGKey(2000 + ci),
                jnp.full((h, w, 1), lab, jnp.float32), num_samples, x_d=1,
            )
        )
        # y-identity: the inverse map must return the requested condition
        y_ident_ref = float(np.abs(y_ref - lab).mean())

        # per-pixel moment comparison, in Monte-Carlo SE units
        m_ref, m_ours = x_ref.mean(0), x_ours.mean(0)
        s_ref, s_ours = x_ref.std(0), x_ours.std(0)
        se = np.maximum(s_ref, s_ours) / np.sqrt(num_samples) + 1e-12
        per_class[f"class_{ci}"] = {
            "label_value": float(lab),
            "mean_abs_diff_max": float(np.abs(m_ref - m_ours).max()),
            "mean_diff_in_se_units_max": float((np.abs(m_ref - m_ours) / se).max()),
            "std_ratio_range": [
                float((s_ours / (s_ref + 1e-12)).min()),
                float((s_ours / (s_ref + 1e-12)).max()),
            ],
            "y_identity_ref_mean_abs_err": y_ident_ref,
        }

    return {
        "task": f"class-conditional {size}x{size} synthetic digits",
        "epochs": epochs,
        "num_samples_per_class": num_samples,
        "ref_final_loss": round(final, 3),
        "ref_train_seconds": round(train_secs, 1),
        "encode_max_abs_diff_after_training": encode_diff,
        "per_class": per_class,
    }


def run_sr_parity(epochs=600, seed=0, size=8, anneal=100, batch=None,
                  num_conditions=2, block_samples=1000):
    """Matched-budget SUPER-RESOLUTION training parity on identical data —
    the SR analog of ``run_image_parity`` (VERDICT r4 missing #2): both
    implementations train their OWN weights on the byte-identical 'SR2,1'
    residual stream (x = hires - up(down(hires)), y = up(down(hires));
    conv_cINN_base_functions.py:233-279, conv_cINN.py:30) for the
    reference driver's full budget (anneal=100, epochs=600 mirrors
    conv_cINN.py:116,119), small arch.

    At trajectory marks each side additionally samples ``block_samples``
    residuals for ``num_conditions`` fixed held-out lowres conditions FROM
    ITS OWN CURRENT WEIGHTS and logs the reference's built-in SR sanity
    invariant — 2x2 blocks of the sampled residual sum to ~0
    (conv_cINN.py:44-45) — so the invariant's trajectory is part of the
    training-parity record on both sides, not just a post-hoc transplant
    check (run_sr_sample_parity)."""
    batch = batch if batch is not None else BATCH
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data.images import (
        SRSource,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.ops.resample import down, up
    from arl_conditional_normalizing_flows_tpu.sample import (
        sample_conditional_images,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    imgs, _ = synthetic_digits(num_per_class=160, num_classes=2, size=size)
    src = SRSource(imgs[:-num_conditions], "SR2,1", batch, residual=True)
    h, w, xy_d = src.xy_shape
    cond_planes = [
        np.asarray(up(down(jnp.asarray(imgs[len(imgs) - num_conditions + ci]))),
                   np.float32)
        for ci in range(num_conditions)
    ]

    epoch_keys = []
    key = jax.random.PRNGKey(seed + 7)
    for _ in range(epochs):
        key, k = jax.random.split(key)
        epoch_keys.append(k)

    def stream(ep):
        return [np.asarray(b) for b in src.epoch(epoch_keys[ep], ep)]

    def noisy(ep, i, b):
        a = ep / anneal if ep < anneal else 1.0
        if a >= 1.0:
            return b
        eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
        return (a * b + (1 - a) * eps).astype(np.float32)

    marks = sorted({min(e, epochs) for e in (150, 300, 450, epochs)})

    def block_sums(x):
        n = x.shape[0]
        return float(np.abs(
            x.reshape(n, h // 2, 2, w // 2, 2).sum(axis=(2, 4))
        ).mean())

    # ---- reference --------------------------------------------------------
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=[h, w, xy_d], x_d=1, squeeze_factor_block_list=list(SF),
        ResNeXt_block_list=list(NRB), num_kernels_list=list(NK),
        cardinality_list=list(CARD), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=False,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables

    @tf.function
    def rstep(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss, lz, ly, ldj

    def ref_block_traj():
        out = []
        for ci, yplane in enumerate(cond_planes):
            rng = np.random.default_rng(1000 + ci)
            z = rng.normal(size=(block_samples, h, w, 1)).astype(np.float32)
            ystack = np.broadcast_to(yplane, (block_samples, h, w, 1))
            xy = np.asarray(
                m.call(tf.constant(np.concatenate([z, ystack], -1)), -1)
            )
            out.append(block_sums(xy[..., 0]))
        return round(float(np.mean(out)), 4)

    t0 = time.time()
    ref_hist, ref_blocks = [], {}
    for ep in range(epochs):
        losses = [
            [float(x) for x in rstep(tf.constant(noisy(ep, i, b)))]
            for i, b in enumerate(stream(ep))
        ]
        ref_hist.append(np.mean(losses, axis=0))
        if ep + 1 in marks:
            ref_blocks[ep + 1] = ref_block_traj()
    ref_secs = time.time() - t0
    ref_hist = np.asarray(ref_hist)

    # ---- ours (own init + own weights, identical batches) -----------------
    cfg = ConvFlowConfig(
        io_shape=(h, w, xy_d), x_d=1, squeeze_factor_blocks=SF, res_blocks=NRB,
        num_kernels=NK, cardinality=CARD, ksize=3, ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    state = create_train_state(model, jnp.zeros((1, h, w, xy_d)), LR, seed=seed)
    step, _ = make_step_fns(model, noise_mode="none")

    def ours_block_traj(params):
        out = []
        for ci, yplane in enumerate(cond_planes):
            x = np.asarray(
                sample_conditional_images(
                    model, params, jax.random.PRNGKey(2000 + ci),
                    jnp.asarray(yplane), block_samples, x_d=1,
                )
            )[..., 0]
            out.append(block_sums(x))
        return round(float(np.mean(out)), 4)

    t0 = time.time()
    ours_hist, ours_blocks = [], {}
    kdummy = jax.random.PRNGKey(0)
    for ep in range(epochs):
        vals = []
        for i, b in enumerate(stream(ep)):
            state, out = step(state, jnp.asarray(noisy(ep, i, b)), kdummy,
                              jnp.float32(1.0))
            vals.append([
                float(out[k]) for k in ("loss", "z_loss", "y_loss", "detJ_loss")
            ])
        ours_hist.append(np.mean(vals, axis=0))
        if ep + 1 in marks:
            ours_blocks[ep + 1] = ours_block_traj(state.params)
    ours_secs = time.time() - t0
    ours_hist = np.asarray(ours_hist)

    names = ["loss", "z_loss", "y_loss", "detJ_loss"]
    tmarks = sorted({min(e, epochs - 1)
                     for e in (0, 9, 49, 99, 149, 299, 449, epochs - 1)})

    def side(hist, secs, blocks):
        tail = hist[-20:, 0]
        return {
            "final": dict(zip(names, np.round(hist[-1], 3).tolist())),
            "best_loss": round(float(hist[:, 0].min()), 3),
            "last20_mean_loss": round(float(tail.mean()), 3),
            "loss_trajectory": np.round(hist[tmarks, 0], 2).tolist(),
            "block_sum_trajectory": {str(k): v for k, v in sorted(blocks.items())},
            "seconds": round(secs, 1),
        }

    return {
        "task": f"SR2,1 residual {size}x{size} synthetic, identical batches, "
                "full 600-epoch budget, own weights both sides",
        "epochs": epochs,
        "annealing_epochs": anneal,
        "loss_trajectory_epochs": [m_ + 1 for m_ in tmarks],
        "block_samples_per_condition": block_samples,
        "num_conditions": num_conditions,
        "reference": side(ref_hist, ref_secs, ref_blocks),
        "ours": side(ours_hist, ours_secs, ours_blocks),
    }


def run_sr_sample_parity(epochs=80, seed=0, size=8, num_samples=4000,
                         num_conditions=2):
    """Conditional-sample MOMENT parity for a SUPER-RESOLUTION model — the SR
    analogue of run_image_sample_parity: train the reference small conv cFlow
    on 'SR2,1' residual pairs (x = hires - up(down(hires)), y = up(down(hires));
    conv_cINN_base_functions.py:233-279, conv_cINN.py:44-45), transplant the
    TRAINED weights into our ConvCFlow, then for ``num_conditions`` fixed
    lowres conditions draw ``num_samples`` residuals through BOTH inverse
    paths. Checks per-pixel sample moments (MC-SE units), the y-identity of
    the reference inverse, and the reference's own built-in SR sanity
    invariant: 2x2 blocks of the sampled residual sum to ~0."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from parity_conv import _map_subnet
    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data.images import (
        SRSource,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.ops.resample import down, up
    from arl_conditional_normalizing_flows_tpu.sample import (
        sample_conditional_images,
    )

    imgs, _ = synthetic_digits(num_per_class=160, num_classes=2, size=size)
    # hold out the last images as sampling conditions
    src = SRSource(imgs[:-num_conditions], "SR2,1", BATCH, residual=True)
    h, w, xy_d = src.xy_shape

    # ---- train the reference on the SR stream ------------------------------
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=[h, w, xy_d], x_d=1, squeeze_factor_block_list=list(SF),
        ResNeXt_block_list=list(NRB), num_kernels_list=list(NK),
        cardinality_list=list(CARD), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=False,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables

    @tf.function
    def rstep(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss

    key = jax.random.PRNGKey(seed + 7)
    t0 = time.time()
    final = None
    for ep in range(epochs):
        a = min(ep / 10.0, 1.0)  # annealing ramp (conv_cINN.py:589-628)
        losses = []
        for i, b in enumerate(src.epoch(jax.random.fold_in(key, ep), ep)):
            b = np.asarray(b)
            if a < 1.0:
                eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
                b = (a * b + (1 - a) * eps).astype(np.float32)
            losses.append(float(rstep(tf.constant(b))))
        final = float(np.mean(losses))
    train_secs = time.time() - t0

    # ---- transplant trained weights into our model --------------------------
    cfg = ConvFlowConfig(
        io_shape=(h, w, xy_d), x_d=1, squeeze_factor_blocks=SF, res_blocks=NRB,
        num_kernels=NK, cardinality=CARD, ksize=3, ref_compat_group_slice=True,
    )
    ours = ConvCFlow(cfg)
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, xy_d)))
    p = dict(params["params"])
    ref_couplings = [
        l for l in m.layers_list if isinstance(l, cref.coupling_layer)
    ]
    for j, rc in enumerate(ref_couplings):
        layer = dict(p[f"couplings_{j}"])
        dil = tuple(int(d) for d in rc.which_dilations)
        layer["net_a"] = _map_subnet(
            rc.model_A, layer["net_a"], rc.cardinality, dil, has_scale=True
        )
        layer["net_b"] = _map_subnet(
            rc.model_b, layer["net_b"], rc.cardinality, dil, has_scale=False
        )
        p[f"couplings_{j}"] = layer
    params = {"params": p}

    # sanity: encode parity on one batch of real SR data
    xy_check = np.asarray(next(iter(src.epoch(key, 0))))
    zy_ref, _ = m.call(tf.constant(xy_check), 1)
    zy_ours, _ = ours.apply(params, jnp.asarray(xy_check))
    encode_diff = float(np.abs(np.asarray(zy_ref) - np.asarray(zy_ours)).max())

    def block_sums(x):
        # 2x2 blocks of the residual must sum to ~0 (conv_cINN.py:44-45)
        n = x.shape[0]
        return np.abs(
            x.reshape(n, h // 2, 2, w // 2, 2).sum(axis=(2, 4))
        ).mean()

    per_condition = {}
    for ci in range(num_conditions):
        hires = np.asarray(imgs[len(imgs) - num_conditions + ci])
        yplane = np.asarray(up(down(jnp.asarray(hires))), np.float32)  # (h,w,1)
        rng = np.random.default_rng(1000 + ci)
        z = rng.normal(size=(num_samples, h, w, 1)).astype(np.float32)
        ystack = np.broadcast_to(yplane, (num_samples, h, w, 1))
        xy_ref = np.asarray(
            m.call(tf.constant(np.concatenate([z, ystack], -1)), -1)
        )
        x_ref, y_ref = xy_ref[..., 0], xy_ref[..., 1:]

        x_ours = np.asarray(
            sample_conditional_images(
                ours, params, jax.random.PRNGKey(2000 + ci),
                jnp.asarray(yplane), num_samples, x_d=1,
            )
        )[..., 0]

        m_ref, m_ours = x_ref.mean(0), x_ours.mean(0)
        s_ref, s_ours = x_ref.std(0), x_ours.std(0)
        se = np.maximum(s_ref, s_ours) / np.sqrt(num_samples) + 1e-12
        per_condition[f"condition_{ci}"] = {
            "mean_abs_diff_max": float(np.abs(m_ref - m_ours).max()),
            "mean_diff_in_se_units_max": float((np.abs(m_ref - m_ours) / se).max()),
            "std_ratio_range": [
                float((s_ours / (s_ref + 1e-12)).min()),
                float((s_ours / (s_ref + 1e-12)).max()),
            ],
            "y_identity_ref_mean_abs_err": float(
                np.abs(y_ref - yplane[None]).mean()
            ),
            "residual_block_sum_ref": float(block_sums(x_ref)),
            "residual_block_sum_ours": float(block_sums(x_ours)),
            "residual_rms": float(np.sqrt((x_ref ** 2).mean())),
        }

    return {
        "task": f"SR2,1 residual {size}x{size} synthetic, fixed lowres conditions",
        "epochs": epochs,
        "num_samples_per_condition": num_samples,
        "ref_final_loss": round(final, 3),
        "ref_train_seconds": round(train_secs, 1),
        "encode_max_abs_diff_after_training": encode_diff,
        "per_condition": per_condition,
    }


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    os.makedirs(RESULTS_DIR, exist_ok=True)
    out = {}
    if which in ("ours", "all"):
        out["ours"] = run_ours(epochs)
        print(json.dumps(out["ours"]), flush=True)
    if which in ("reference", "all"):
        out["reference"] = run_reference(epochs)
        print(json.dumps(out["reference"]), flush=True)
    if which in ("image",):
        out["image"] = run_image_parity(epochs)
        print(json.dumps(out["image"], indent=2), flush=True)
    if which in ("image_full",):
        # the reference driver's full budget: 100 annealing + 500 clean epochs
        out["image_full"] = run_image_parity(epochs, anneal=100)
        print(json.dumps(out["image_full"], indent=2), flush=True)
    if which in ("image_flagship",):
        # the reference driver's FLAGSHIP arch (conv_cINN.py:56-65,88,94):
        # 28x28, [0,1,0,0]/[3,3,3,3]/[64,64,32,32]/[8,8,4,4], LN, batch 32
        # num_per_class=64 -> 4 class-pure batches/epoch: the reference side
        # costs ~45 s per flagship CPU step, so the epoch budget is the knob
        out["image_flagship"] = run_image_parity(
            epochs, size=28, batch=32, layer_norm=True, num_per_class=64,
            anneal=min(100, max(4, epochs // 6)),
            arch=((0, 1, 0, 0), (3, 3, 3, 3), (64, 64, 32, 32), (8, 8, 4, 4)),
        )
        print(json.dumps(out["image_flagship"], indent=2), flush=True)
    if which in ("image_sample",):
        out["image_sample"] = run_image_sample_parity(epochs)
        print(json.dumps(out["image_sample"], indent=2), flush=True)
    if which in ("sr_sample",):
        out["sr_sample"] = run_sr_sample_parity(epochs)
        print(json.dumps(out["sr_sample"], indent=2), flush=True)
    if which in ("sr_full",):
        # SR matched-budget training parity at the reference's full budget
        out["sr_full"] = run_sr_parity(epochs, anneal=100)
        print(json.dumps(out["sr_full"], indent=2), flush=True)
    path = os.path.join(RESULTS_DIR, "conv_train_parity.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)


if __name__ == "__main__":
    main()
