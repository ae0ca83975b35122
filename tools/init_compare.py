"""Family-by-family init-distribution comparison: our default flagship init
vs the reference's exact epoch-0 weights (transplanted via the PARITY §2
mapping).

The refinit leg (PARITY §5) showed that ours trained from the reference's
epoch-0 weights reaches the reference band — the flagship tail offset is
carried by the initialization. This tool answers WHICH parameter family
differs: for every conv-kernel leaf it computes flattened-matrix statistics
(entry std, column/row norms, singular values), aggregates them per family
(trunk / bottleneck-in / grouped-per-dilation / bottleneck-out / head /
tanh-scale / biases), and prints ours-vs-ref side by side with relative
deltas. It also evaluates the initial loss components of both trees on the
first flagship stream batch — a functional summary that catches
distributional differences per-leaf marginals can miss.

Reference init surface: every Conv2D gets its own Orthogonal(0.1)
(conv_cINN_base_functions.py:415-498 pass `init` to each layer,
conv_cINN_make_model.py:1119), tanh-scale init 1.0
(conv_cINN_make_model.py:107-116), Keras zero conv biases.

Usage: python tools/init_compare.py [--seed N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
sys.path.insert(0, ROOT)


def classify(path: str, n_dilations: int):
    """Family for one param leaf path like
    couplings_3/net_a/DilatedResidualBlock_1/Conv_2/kernel."""
    if path.endswith("tanh_scale"):
        return "tanh_scale"
    if path.endswith("bias"):
        return "bias"
    if not path.endswith("kernel"):
        return "other"  # LayerNorm scale/bias
    m = re.search(r"DilatedResidualBlock_\d+/Conv_(\d+)/kernel$", path)
    if m:
        idx = int(m.group(1))
        if idx == 0:
            return "bneck_in_1x1"
        if idx == 1 + n_dilations:
            return "bneck_out_1x1"
        return f"grouped_dil{idx - 1}"
    if re.search(r"net_[ab]/Conv_0/kernel$", path):
        return "trunk"
    if re.search(r"net_[ab]/Conv_1/kernel$", path):
        return "head"
    return "other"


def kernel_stats(k: np.ndarray) -> dict:
    """Flatten (k,k,cin,cout) -> (rows, cols) like both initializers do and
    summarize the matrix."""
    k = np.asarray(k, np.float64)
    if k.ndim == 0:
        return {"value": float(k)}
    mat = k.reshape(-1, k.shape[-1])
    rows, cols = mat.shape
    col_norms = np.linalg.norm(mat, axis=0)
    row_norms = np.linalg.norm(mat, axis=1)
    sv = np.linalg.svd(mat, compute_uv=False)
    return {
        "rows": rows,
        "cols": cols,
        "entry_std": float(mat.std()),
        "fro": float(np.linalg.norm(mat)),
        "col_norm_mean": float(col_norms.mean()),
        "col_norm_std": float(col_norms.std()),
        "row_norm_mean": float(row_norms.mean()),
        "row_norm_std": float(row_norms.std()),
        "sv_max": float(sv.max()),
        "sv_min": float(sv.min()),
        "sv_mean": float(sv.mean()),
    }


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def aggregate(leaves: dict, n_dilations: int):
    fams = {}
    for path, arr in leaves.items():
        fam = classify(path, n_dilations)
        if fam in ("other",):
            continue
        if fam == "bias":
            fams.setdefault(fam, []).append(
                {"max_abs": float(np.abs(arr).max())})
            continue
        if fam == "tanh_scale":
            fams.setdefault(fam, []).append({"value": float(arr)})
            continue
        fams.setdefault(fam, []).append(kernel_stats(arr))
    agg = {}
    for fam, rows in fams.items():
        keys = rows[0].keys()
        agg[fam] = {"n_leaves": len(rows)}
        for key in keys:
            vals = [r[key] for r in rows]
            agg[fam][key] = round(float(np.mean(vals)), 6)
            if len(vals) > 1:
                agg[fam][key + "_sd"] = round(float(np.std(vals)), 6)
    return agg


def initial_loss(model, params, batch):
    import jax.numpy as jnp

    out = model.apply(params, jnp.asarray(batch), method="log_loss")
    return {k: round(float(v), 3) for k, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shared", action="store_true", help=(
        "compare the ref_compat_shared_init rewrite (our reference-faithful "
        "init pipeline) instead of the default independent-draw init"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.json is None:
        name = "init_compare_shared.json" if args.shared else "init_compare.json"
        args.json = os.path.join(ROOT, "benchmarks", "results", name)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import flagship_split as fs
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )

    sf, nrb, nk, card = fs.ARCH
    cfg = ConvFlowConfig(
        io_shape=fs.XY_SHAPE, x_d=1, squeeze_factor_blocks=sf, res_blocks=nrb,
        num_kernels=nk, cardinality=card, ksize=3, layer_norm=True,
        ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    ours = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1,) + fs.XY_SHAPE)
    )
    ref = fs._ref_init_params(ours, args.seed)
    if args.shared:
        from arl_conditional_normalizing_flows_tpu.models.init_compat import (
            shared_shape_reinit,
        )

        ours = shared_shape_reinit(ours, args.seed)

    n_dil = 3  # flagship dilations (1,2,4) — index only, see classify()
    leaves_ours = flatten(ours["params"])
    leaves_ref = flatten(ref["params"])
    assert leaves_ours.keys() == leaves_ref.keys()
    agg_ours = aggregate(leaves_ours, n_dil)
    agg_ref = aggregate(leaves_ref, n_dil)

    print(f"{'family':>16} {'stat':>14} {'ours':>12} {'ref':>12} {'rel_delta':>10}")
    deltas = {}
    for fam in sorted(agg_ours):
        for key in agg_ours[fam]:
            if key.endswith("_sd") or key in ("n_leaves", "rows", "cols"):
                continue
            a, b = agg_ours[fam][key], agg_ref[fam][key]
            rel = (a - b) / (abs(b) + 1e-12)
            deltas[f"{fam}.{key}"] = round(rel, 4)
            flag = " <<<" if abs(rel) > 0.05 else ""
            print(f"{fam:>16} {key:>14} {a:12.6f} {b:12.6f} {rel:10.4f}{flag}")

    # functional summary: initial loss on the real first stream batch
    batch = np.asarray(fs._stream(1)[0, 0])
    li_ours = initial_loss(model, ours, batch)
    li_ref = initial_loss(model, ref, batch)
    print("\ninitial loss (stream epoch-1 batch-0):")
    print("  ours:", li_ours)
    print("  ref :", li_ref)

    out = {
        "seed": args.seed,
        "families_ours": agg_ours,
        "families_ref": agg_ref,
        "relative_deltas": deltas,
        "initial_loss_ours": li_ours,
        "initial_loss_ref": li_ref,
        "flagged": {k: v for k, v in deltas.items() if abs(v) > 0.05},
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwritten: {args.json}")
    print("flagged (>5% relative):", json.dumps(out["flagged"], indent=1))


if __name__ == "__main__":
    main()
