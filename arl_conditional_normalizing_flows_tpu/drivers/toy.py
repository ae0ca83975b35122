"""Toy cINN training/eval driver (the reference's TOYcINN.py as a CLI).

Reference hyperparameter block: TOYcINN.py:32-183.  Defaults here mirror the
reference defaults: 4 coupling blocks x 6 masks = 24 layers, intermediate
dims 32, 6 dense layers, batch 1000, lr 1e-4, 10 annealing epochs, early
stopping patience 10 on train loss.

Example:
    python -m arl_conditional_normalizing_flows_tpu.drivers.toy \
        --dataset crescents --epochs 200 --outdir /tmp/toy_run
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--dataset",
        default="crescents",
        choices=["crescents", "crescents_overlapping", "mixed", "continuous_sectors"],
        help="TOYcINN.py:37-62",
    )
    p.add_argument("--which-classes", type=int, nargs="*", default=[0, 1, 4],
                   help="mixed-shapes class subset (TOYcINN.py:56)")
    p.add_argument("--noise", type=float, default=0.05, help="crescent noise")
    p.add_argument("--sector-width", type=float, default=np.pi / 4)
    p.add_argument("--coupling-blocks", type=int, default=4,
                   help="x6 masks = num coupling layers (TOYcINN.py:93)")
    p.add_argument("--intermediate-dims", type=int, default=32)
    p.add_argument("--num-layers", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=1000)
    p.add_argument("--batches-per-class", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--annealing-epochs", type=int, default=10)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fixed-mask-order", action="store_true",
                   help="skip the within-group mask shuffle (TOYcINN.py:172-182)")
    p.add_argument("--load", default=None, help="npz weights to resume from")
    p.add_argument("--outdir", default="toy_run")
    p.add_argument("--eval-samples", type=int, default=2000)
    p.add_argument("--plot", action="store_true",
                   help="write joint/conditional/latent/loss PNGs (the "
                   "reference's visual harness, TOYcINN.py:321-1206)")
    p.add_argument("--sweep", type=float, nargs="*", default=None,
                   help="extra y' values (standardized) for an off-manifold "
                   "interpolation sweep (TOYcINN.py:1115-1206)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all visible devices")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port for "
                   "jax.distributed.initialize; implies --data-parallel")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank")
    p.add_argument("--scan-steps", type=int, default=0,
                   help="fuse N optimizer steps into one XLA program "
                   "(train.make_scan_train_step); drops a trailing partial "
                   "group per epoch. 0 disables")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # multi-host bring-up MUST precede any backend touch (parallel.mesh)
    from arl_conditional_normalizing_flows_tpu.parallel import (
        initialize_distributed,
    )

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.data import toy_datasets
    from arl_conditional_normalizing_flows_tpu.models import (
        ToyCINN,
        ToyConfig,
        shuffle_mask_indices,
    )
    from arl_conditional_normalizing_flows_tpu.sample import (
        conditional_moments,
        sample_conditional,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        HistoryLogger,
        create_train_state,
        fit,
        load_npz_extras,
        load_params_npz,
        make_step_fns,
        save_params_npz,
    )

    nproc, rank = jax.process_count(), jax.process_index()
    if nproc > 1:
        args.data_parallel = True
    is_main = rank == 0
    os.makedirs(args.outdir, exist_ok=True)
    from arl_conditional_normalizing_flows_tpu.utils import write_run_metadata

    if is_main:
        write_run_metadata(args.outdir, args)
    num_layers_total = 6 * args.coupling_blocks

    # layer-order permutation is part of the model identity (TOYcINN.py:174).
    # When resuming, restore the order SAVED WITH THE WEIGHTS — the reference
    # silently invalidates a loaded model if the fresh random order differs
    # (TOYcINN.py:228-235; SURVEY.md §5 checkpoint/resume).
    saved_order = None
    if args.load:
        extras = load_npz_extras(args.load)
        if "mask_indices" in extras:
            saved_order = tuple(int(i) for i in extras["mask_indices"])
            assert len(saved_order) == num_layers_total, (
                f"loaded mask order has {len(saved_order)} layers but the "
                f"requested architecture has {num_layers_total} — pass the "
                "matching --coupling-blocks"
            )
    if saved_order is not None:
        order = saved_order
    elif args.fixed_mask_order:
        order = tuple(range(num_layers_total))
    else:
        order = shuffle_mask_indices(
            np.random.default_rng(args.seed), num_layers_total
        )

    cfg = ToyConfig(
        num_coupling_layers=num_layers_total,
        intermediate_dims=args.intermediate_dims,
        num_layers=args.num_layers,
        mask_indices=order,
    )
    model = ToyCINN(cfg)

    if args.dataset in ("crescents", "crescents_overlapping"):
        ds = toy_datasets.make_moons_dataset(
            noise=args.noise, overlapping=args.dataset.endswith("overlapping")
        )
    elif args.dataset == "mixed":
        ds = toy_datasets.make_mixed_dataset(args.which_classes)
    else:
        ds = None  # continuous sectors: no class structure

    state = create_train_state(model, jnp.zeros((2, 3)), args.lr, seed=args.seed)
    if args.load:
        state = state.replace(params=load_params_npz(args.load, state.params))
    mesh = None
    if args.data_parallel:
        from arl_conditional_normalizing_flows_tpu.parallel import make_mesh

        mesh = make_mesh()
    if nproc > 1:
        from jax.sharding import PartitionSpec as P

        from arl_conditional_normalizing_flows_tpu.parallel import shard_batch

        state = shard_batch(state, mesh, spec=P())
    train_step, eval_step = make_step_fns(
        model, mesh=mesh, noise_mode="x_only", x_d=cfg.x_d
    )

    if ds is not None:
        # per-host slice of the globally class-pure epoch (nproc=1 -> the
        # plain batch-then-shuffle iterator)
        def data_epoch(key, epoch):
            return ds.epoch_iterator_distributed(
                key, args.batches_per_class, args.batch_size, nproc, rank
            )

        per_epoch = (
            args.batches_per_class * len(ds.class_labels)
            if nproc == 1
            else len(ds.class_labels) * (args.batches_per_class // nproc)
        )
    else:
        n_batches = args.batches_per_class * 2
        per_epoch = n_batches

        def data_epoch(key, epoch):
            import jax as _jax

            # continuous condition — no class structure; each host draws its
            # own shard of the (weak-scaled) global batch
            for k in _jax.random.split(_jax.random.fold_in(key, rank), n_batches):
                yield toy_datasets.sample_continuous_sectors(
                    k, args.batch_size, args.sector_width
                )

    fit_mesh, batch_spec = mesh, None
    if args.scan_steps > 1:
        from arl_conditional_normalizing_flows_tpu.train import (
            epoch_stacks,
            make_scan_train_step,
        )

        assert per_epoch >= args.scan_steps, (
            f"--scan-steps {args.scan_steps} exceeds the {per_epoch} batches "
            "per epoch — every epoch would be empty"
        )
        train_step = make_scan_train_step(
            model, args.scan_steps, mesh=mesh, noise_mode="x_only", x_d=cfg.x_d
        )
        per_batch_epoch = data_epoch
        data_epoch = lambda key, epoch: epoch_stacks(
            per_batch_epoch(key, epoch), args.scan_steps
        )
        if nproc == 1:
            fit_mesh, batch_spec = None, None  # uncommitted stacks; see conv.py
        else:
            from jax.sharding import PartitionSpec as P

            fit_mesh, batch_spec = mesh, P(None, "data")

    history = HistoryLogger(
        csv_path=os.path.join(args.outdir, "history.csv") if is_main else None,
        jsonl_path=os.path.join(args.outdir, "history.jsonl") if is_main else None,
    )
    res = fit(
        state,
        train_step,
        data_epoch,
        key=jax.random.PRNGKey(args.seed),
        num_epochs=args.epochs,
        num_annealing_epochs=args.annealing_epochs,
        patience=args.patience,
        history=history,
        mesh=fit_mesh,
        batch_spec=batch_spec,
    )

    params_np = jax.tree_util.tree_map(np.asarray, res.state.params)
    if is_main:
        save_params_npz(
            os.path.join(args.outdir, "weights.npz"),
            params_np,
            extra={"mask_indices": np.asarray(order)},
        )
    if not is_main:
        return res

    # conditional-sampling eval: per-class moments (the quantitative core of
    # the reference's plot harness, TOYcINN.py:321-757)
    report = {"final": history.rows[-1] if history.rows else {}}
    if ds is not None:
        per_class = {}
        for ci, lab in enumerate(ds.class_labels):
            lab_std = (lab - ds.mean[2]) / ds.std[2]
            s = sample_conditional(
                model, params_np, jax.random.PRNGKey(100 + ci),
                lab_std, args.eval_samples, x_d=cfg.x_d,
            )
            m = conditional_moments(s[..., : cfg.x_d])
            truth = ds.sample_class_batch(
                jax.random.PRNGKey(200 + ci), ci, args.eval_samples
            )
            per_class[str(lab)] = {
                "sample_mean": np.asarray(m["mean"]).tolist(),
                "sample_std": np.asarray(m["std"]).tolist(),
                "true_mean": np.asarray(truth[:, : cfg.x_d].mean(0)).tolist(),
                "true_std": np.asarray(truth[:, : cfg.x_d].std(0)).tolist(),
                "y_identity_mean": float(s[:, cfg.x_d :].mean()),
            }
        report["per_class_moments"] = per_class
    else:
        # continuous sectors (TOYcINN_make_datasets.py:1114-1300): sample at
        # pinned sector centers and score conditional fidelity — circular
        # angular error vs the requested center and the in-sector fraction.
        # This is the quantitative form of the reference's "deeper network"
        # claim for this dataset (README.md:71).
        from arl_conditional_normalizing_flows_tpu.evaluation import (
            sector_fidelity,
        )

        centers = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        per_sector = {}
        for ci, c in enumerate(centers):
            s = np.asarray(sample_conditional(
                model, params_np, jax.random.PRNGKey(300 + ci),
                float(c), args.eval_samples, x_d=cfg.x_d,
            ))
            per_sector[f"{c:.3f}"] = sector_fidelity(
                s, float(c), args.sector_width, x_d=cfg.x_d
            )
        report["per_sector"] = per_sector
        report["sector_aggregate"] = {
            k: float(np.mean([v[k] for v in per_sector.values()]))
            for k in ("mean_abs_angular_error", "frac_in_sector",
                      "frac_in_unit_disk")
        }

    if args.plot:
        from arl_conditional_normalizing_flows_tpu.evaluation import plots
        from arl_conditional_normalizing_flows_tpu.sample import sweep_conditions

        plots.plot_loss_curves(history.rows, os.path.join(args.outdir, "loss.png"))
        if args.annealing_epochs > 0:
            # annealing losses are measured on noise-blended data; the
            # reference keeps the two histories separate (TOYcINN.py:274-304)
            plots.plot_annealing_history(
                history.rows, os.path.join(args.outdir, "annealing.png")
            )
        if ds is not None:
            data = np.asarray(
                ds.epoch_array(jax.random.PRNGKey(3), 2, 500)
            ).reshape(-1, 3)
        else:
            data = np.asarray(
                toy_datasets.sample_continuous_sectors(
                    jax.random.PRNGKey(3), 2000, args.sector_width
                )
            )
        plots.plot_toy_joint(data, os.path.join(args.outdir, "data.png"), "data")
        zy, _ = model.apply(params_np, data)
        zy = np.asarray(zy)
        plots.plot_latent(zy[..., : cfg.x_d], os.path.join(args.outdir, "latent.png"))

        # condition set: the class labels plus the reference's DEFAULT
        # off-manifold interpolation grid (y' = -2..2 for two standardized
        # classes, TOYcINN.py:1115-1126); --sweep appends extra values
        if ds is not None:
            conds = [(lab - ds.mean[2]) / ds.std[2] for lab in ds.class_labels]
            interp = plots.default_interpolation_conditions(
                ds.class_labels, ds.mean[2], ds.std[2]
            )
        else:
            centers = np.linspace(0, 2 * np.pi, 9)
            conds = interp = [float(c) for c in centers]
        sweeps = sweep_conditions(
            model, params_np, jax.random.PRNGKey(4),
            np.asarray(list(conds) + list(args.sweep or []), np.float32),
            args.eval_samples, x_d=cfg.x_d,
        )
        plots.plot_toy_conditional_grid(
            [np.asarray(s[:, : cfg.x_d]) for s in sweeps],
            list(conds) + list(args.sweep or []),
            os.path.join(args.outdir, "conditional.png"),
        )
        interp_sweeps = sweep_conditions(
            model, params_np, jax.random.PRNGKey(5),
            np.asarray(interp, np.float32), args.eval_samples, x_d=cfg.x_d,
        )
        plots.plot_toy_conditional_grid(
            [np.asarray(s[:, : cfg.x_d]) for s in interp_sweeps], interp,
            os.path.join(args.outdir, "interpolation.png"),
        )

        # y'-identity overlays (TOYcINN.py:463-492): encode f_Y vs y', and
        # the decode direction's recovered y vs the requested condition
        dec_req = np.concatenate(
            [np.full((len(s),), c, np.float32) for s, c in zip(sweeps, list(conds) + list(args.sweep or []))]
        )
        dec_mapped = np.concatenate(
            [np.asarray(s[:, cfg.x_d :]).reshape(-1) for s in sweeps]
        )
        plots.plot_y_identity(
            data[:, cfg.x_d :], zy[:, cfg.x_d :], dec_req, dec_mapped,
            os.path.join(args.outdir, "y_identity.png"),
        )

        # 2x2 forward/backward map panel (the reference's per-dataset figure
        # family, TOYcINN.py:1098+)
        sampled_xy = np.concatenate([np.asarray(s) for s in sweeps[: len(conds)]])
        plots.plot_forward_backward_grid(
            data, zy, sampled_xy,
            os.path.join(args.outdir, "forward_backward.png"),
        )

    with open(os.path.join(args.outdir, "eval.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report.get("final", {}), indent=2))
    return res


def cli():
    """Console-script entry: discard the return value so setuptools'
    sys.exit(main()) doesn't print it and exit nonzero."""
    main()
    return 0


if __name__ == "__main__":
    cli()
