"""One-off probe behind tools/init_compare.py: inspect the reference's
grouped-conv epoch-0 kernels block-by-block to explain the rank-deficient
spectrum (sv_min = 0 exactly) that independent per-group orthogonal draws
cannot produce. Saves both full param trees to npz for cheap re-probing.

Usage: python tools/init_probe_blocks.py [--seed N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, "benchmarks", "results", "init_trees_s{seed}.npz")


def get_trees(seed: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import flagship_split as fs
    from tools.init_compare import flatten
    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )

    path = CACHE.format(seed=seed)
    if os.path.exists(path):
        d = np.load(path)
        ours = {k[5:]: d[k] for k in d.files if k.startswith("ours|")}
        ref = {k[4:]: d[k] for k in d.files if k.startswith("ref|")}
        return ours, ref

    sf, nrb, nk, card = fs.ARCH
    cfg = ConvFlowConfig(
        io_shape=fs.XY_SHAPE, x_d=1, squeeze_factor_blocks=sf, res_blocks=nrb,
        num_kernels=nk, cardinality=card, ksize=3, layer_norm=True,
        ref_compat_group_slice=True,
    )
    model = ConvCFlow(cfg)
    ours_t = model.init(jax.random.PRNGKey(seed), jnp.zeros((1,) + fs.XY_SHAPE))
    ref_t = fs._ref_init_params(ours_t, seed)
    ours = {k: np.asarray(v) for k, v in flatten(ours_t["params"]).items()}
    ref = {k: np.asarray(v) for k, v in flatten(ref_t["params"]).items()}
    np.savez_compressed(
        path,
        **{f"ours|{k}": v for k, v in ours.items()},
        **{f"ref|{k}": v for k, v in ref.items()},
    )
    print(f"cached trees: {path}")
    return ours, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    ours, ref = get_trees(args.seed)

    # pick a few grouped kernels (DilatedResidualBlock Conv_1..Conv_3)
    import re

    picks = [
        k for k in sorted(ref)
        if re.search(r"couplings_[04]/net_a/DilatedResidualBlock_0/Conv_[123]/kernel$", k)
    ]
    for key in picks:
        rk, ok = ref[key], ours[key]
        kk, _, d, cout = rk.shape
        print(f"\n== {key}  shape {rk.shape}")
        # infer group width: flagship cardinality 8
        for card in (8, 4):
            if cout % card == 0:
                gsz = cout // card
                break
        blocks = [rk[..., g * gsz:(g + 1) * gsz].reshape(-1, gsz)
                  for g in range(cout // gsz)]
        nb = len(blocks)
        # pairwise subspace overlap: ||Qi^T Qj||_F^2 / gsz  (1.0 = same span)
        ovl = np.zeros((nb, nb))
        for i in range(nb):
            qi, _ = np.linalg.qr(blocks[i])
            for j in range(nb):
                qj, _ = np.linalg.qr(blocks[j])
                ovl[i, j] = (np.linalg.norm(qi.T @ qj) ** 2) / gsz
        print("ref pairwise span overlap (1=same subspace):")
        print(np.array_str(ovl, precision=2, suppress_small=True))
        ident = np.zeros((nb, nb))
        for i in range(nb):
            for j in range(nb):
                ident[i, j] = float(
                    np.linalg.norm(blocks[i] - blocks[j])
                    / (np.linalg.norm(blocks[i]) + 1e-12))
        print("ref pairwise block rel-difference (0=identical):")
        print(np.array_str(ident, precision=2, suppress_small=True))
        sv = np.linalg.svd(rk.reshape(-1, cout), compute_uv=False)
        print("ref top svs:", np.round(sv[:6], 4), " min:", round(sv[-1], 6),
              " rank:", int((sv > 1e-9).sum()), "of", min(rk.reshape(-1, cout).shape))
        svo = np.linalg.svd(ok.reshape(-1, cout), compute_uv=False)
        print("ours svs uniform 0.1:", bool(np.allclose(svo, 0.1)))


if __name__ == "__main__":
    main()
