"""Post-hoc per-sector conditional-fidelity scoring for toy runs.

Scores a finished `cnf-toy --dataset continuous_sectors` run directory with
the same metrics the driver now emits inline (drivers/toy.py per_sector):
circular angular error vs the requested sector center, in-sector fraction,
unit-disk fraction. Used to compare the deeper-vs-default configs — the
reference's qualitative "takes a deeper network to perform well" claim for
this dataset (README.md:71) made quantitative.

Usage: python tools/sector_eval.py RUN_DIR [RUN_DIR...]
Writes benchmarks/results/toy_sectors_compare.json when given 2+ dirs.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def score(run_dir: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig
    from arl_conditional_normalizing_flows_tpu.sample.sampler import (
        sample_conditional,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        load_npz_extras,
        load_params_npz,
    )
    import jax.numpy as jnp

    with open(os.path.join(run_dir, "run.json")) as f:
        args = json.load(f)["args"]
    assert args["dataset"] == "continuous_sectors", args["dataset"]
    extras = load_npz_extras(os.path.join(run_dir, "weights.npz"))
    cfg = ToyConfig(
        num_coupling_layers=6 * args["coupling_blocks"],
        intermediate_dims=args["intermediate_dims"],
        num_layers=args["num_layers"],
        mask_indices=tuple(int(i) for i in extras["mask_indices"]),
    )
    model = ToyCINN(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    params = load_params_npz(os.path.join(run_dir, "weights.npz"), template)

    from arl_conditional_normalizing_flows_tpu.evaluation import (
        sector_fidelity,
    )

    width = args["sector_width"]
    centers = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    per_sector = {}
    for ci, c in enumerate(centers):
        s = np.asarray(sample_conditional(
            model, params, jax.random.PRNGKey(300 + ci),
            float(c), args["eval_samples"], x_d=cfg.x_d,
        ))
        per_sector[f"{c:.3f}"] = sector_fidelity(s, float(c), width,
                                                 x_d=cfg.x_d)
    hist = [json.loads(l) for l in open(os.path.join(run_dir, "history.jsonl"))]
    return {
        "run": os.path.basename(os.path.normpath(run_dir)),
        "config": {
            "coupling_layers": cfg.num_coupling_layers,
            "intermediate_dims": cfg.intermediate_dims,
            "num_layers": cfg.num_layers,
        },
        "final_loss": hist[-1]["loss"],
        "best_loss": min(h["loss"] for h in hist),
        "epochs": len(hist),
        "aggregate": {
            k: float(np.mean([v[k] for v in per_sector.values()]))
            for k in next(iter(per_sector.values()))
        },
        "per_sector": per_sector,
    }


def main():
    reports = [score(d) for d in sys.argv[1:]]
    out = {"runs": reports}
    print(json.dumps(out, indent=2))
    if len(reports) >= 2:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "results", "toy_sectors_compare.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
