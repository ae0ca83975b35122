"""Standalone checkpoint evaluation CLI (`cnf-eval`).

Loads a conv checkpoint directory (written by cnf-conv / cnf-pretrain-noise —
the architecture config is read from the checkpoint's own metadata) and
computes, without any training:

- validation joint-NLL components and bits/dim;
- latent-normality statistics of the encoded validation set;
- conditional-sampling moments (+ optional sample-grid / SR-panel PNGs).

The reference has no such tool — evaluation there means re-running the
training script with TRAIN disabled and reading plots (TOYcINN.py:158).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True,
                   help="checkpoint dir written by cnf-conv (contains arch.json)")
    p.add_argument("--model-type", default="class", choices=["class", "SR4,2", "SR2,1"])
    # same default as the training driver (cnf-conv) so evaluating a
    # checkpoint with default flags scores it on the data it trained on;
    # mnist falls back to synthetic when no cached archive exists
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "fashion_mnist", "synthetic"])
    p.add_argument("--synthetic-per-class", type=int, default=128)
    p.add_argument("--data-classes", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--records-dir", default=None)
    p.add_argument("--logits", action="store_true", default=True)
    p.add_argument("--no-logits", dest="logits", action="store_false")
    p.add_argument("--residual", action="store_true", default=True)
    p.add_argument("--no-residual", dest="residual", action="store_false")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--eval-samples", type=int, default=64)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--outdir", default=None, help="default: <checkpoint-dir>/..")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--export-sampler", default=None, metavar="PATH",
                   help="also write an AOT StableHLO serving artifact of the "
                   "conditional sampler (serve.export; params baked in, "
                   "symbolic batch dim)")
    p.add_argument("--export-platforms", nargs="*", default=None,
                   help="lowering platforms for --export-sampler, e.g. tpu cpu "
                   "(default: current backend)")
    p.add_argument("--export-multidraw", default=None, metavar="PATH",
                   help="also write the MULTI-DRAW serving artifact: one call "
                   "computes (d, b) batched draws per condition, amortizing "
                   "per-call dispatch (serve.export_multidraw_sampler; both "
                   "d and b symbolic)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        SRSource,
    )
    from arl_conditional_normalizing_flows_tpu.drivers import conv as conv_driver
    from arl_conditional_normalizing_flows_tpu.evaluation import (
        bits_per_dim,
        latent_normality_stats,
    )
    from arl_conditional_normalizing_flows_tpu.models import ConvCFlow, ConvFlowConfig
    from arl_conditional_normalizing_flows_tpu.train import (
        CheckpointManager,
        MeanMetrics,
        create_train_state,
        make_step_fns,
    )

    # architecture comes from the checkpoint's own metadata
    arch_path = os.path.join(args.checkpoint_dir, "arch.json")
    with open(arch_path) as f:
        raw_arch = json.load(f)
    arch = {k: tuple(v) if isinstance(v, list) else v for k, v in raw_arch.items()}
    cfg = ConvFlowConfig(**arch)
    model = ConvCFlow(cfg)

    val_x, val_y = conv_driver.load_arrays(args, "test")
    if args.model_type == "class":
        val_src = ClassConditionalSource(
            val_x, val_y, args.data_classes, args.batch_size, use_logits=args.logits
        )
    else:
        val_src = SRSource(val_x, args.model_type, args.batch_size,
                           residual=args.residual)
    h, w, xy_d = cfg.io_shape
    assert val_src.xy_shape == cfg.io_shape, (val_src.xy_shape, cfg.io_shape)

    state = create_train_state(model, jnp.zeros((1, h, w, xy_d)), 1e-3)
    # create=False: a typo'd path raises instead of minting an empty
    # checkpoint dir and "restoring" an untrained model
    mgr = CheckpointManager(args.checkpoint_dir, config=cfg, create=False)
    epoch, state = mgr.restore(state)
    assert epoch is not None, f"no checkpoint found in {args.checkpoint_dir}"
    mgr.close()
    print(f"restored epoch {epoch}")

    if args.export_sampler or args.export_multidraw:
        from arl_conditional_normalizing_flows_tpu.serve import (
            export_multidraw_sampler,
            export_sampler,
            make_image_serving_fn,
            save_artifact,
        )

        de_logit = args.model_type == "class" and args.logits
        residual = args.model_type != "class" and args.residual
        fn = make_image_serving_fn(
            model, state.params, cfg.x_d, de_logit=de_logit, residual=residual
        )
        meta = {
            "arch": raw_arch,
            "model_type": args.model_type, "epoch": int(epoch),
            "de_logit": de_logit, "residual": residual,
        }
        if args.export_sampler:
            exported = export_sampler(
                fn,
                [(h, w, cfg.x_d), (h, w, xy_d - cfg.x_d)],
                platforms=args.export_platforms,
            )
            side = save_artifact(args.export_sampler, exported, metadata=meta)
            print(f"exported serving artifact: {args.export_sampler} "
                  f"({side['nr_bytes']} bytes, platforms={side['platforms']})")
        if args.export_multidraw:
            exported = export_multidraw_sampler(
                fn,
                (h, w, cfg.x_d),
                (h, w, xy_d - cfg.x_d),
                platforms=args.export_platforms,
            )
            side = save_artifact(
                args.export_multidraw, exported,
                metadata={**meta, "entry": "multidraw"},
            )
            print(f"exported multidraw artifact: {args.export_multidraw} "
                  f"({side['nr_bytes']} bytes, platforms={side['platforms']})")

    # one forward per batch: the loss components and the encoded latent
    # come from the same pass (a separate encode jit doubled the eval
    # compute and the per-batch dispatches through the remote backend)
    eval_batch = jax.jit(
        lambda params, xy: model.apply(params, xy, method="log_loss_with_latent")
    )
    metrics = MeanMetrics()
    zs = []
    for xy in val_src.epoch(jax.random.PRNGKey(0), 0):
        out, zy = eval_batch(state.params, xy)
        metrics.update(jax.tree_util.tree_map(float, out))
        zs.append(np.asarray(zy[..., : cfg.x_d]))
    row = metrics.result()
    report = {"epoch": int(epoch), "dataset": args.dataset,
              "model_type": args.model_type, **row}
    report["bits_per_dim"] = bits_per_dim(
        row["z_loss"] + row["detJ_loss"], h * w * cfg.x_d
    )
    report["latent_normality"] = latent_normality_stats(np.concatenate(zs))
    outdir = args.outdir or os.path.dirname(os.path.abspath(args.checkpoint_dir))
    args.outdir = outdir
    os.makedirs(outdir, exist_ok=True)
    report["sampling"] = conv_driver._sampling_eval(
        args, model, state.params, val_src, cfg.x_d
    )
    with open(os.path.join(outdir, "checkpoint_eval.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


def cli():
    main()
    return 0


if __name__ == "__main__":
    cli()
