"""``cnf-import-reference`` — TF-free conversion of reference-trained
checkpoints into framework weight files (VERDICT round-1 item 4).

Subcommands:

- ``conv``: a reference ``weights_… .h5`` / ``checkpoint_… .hdf5``
  (conv_cINN.py:639-641, :517-526; Keras 2 or Keras 3 layout) -> npz with the
  arch string attached (the compatibility contract the reference encodes in
  the filename). The architecture is parsed from the filename convention when
  possible; explicit flags override.
- ``toy``: the object-array ``weights_… .npy`` + ``mask_indices_… .npy`` pair
  (TOYcINN.py:306-317) -> npz with the mask order attached.

The resulting npz loads through the drivers' ``--load`` path
(``train.load_params_npz``), which re-validates the arch/mask-order contract.

Examples:
    cnf-import-reference conv --weights weights_class_mnist_28x28x2_SqFa0100_NRB3333_C8844_NK64643232_KS3_D124_LNTrue.h5 --output imported.npz
    cnf-import-reference toy --weights weights_crescents_NCL24_ID32_NL6.npy \
        --mask-indices mask_indices_crescents_NCL24_ID32_NL6.npy --output toy.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)

    c = sub.add_parser("conv", help="import a conv cFlow .h5/.hdf5 checkpoint")
    c.add_argument("--weights", required=True)
    c.add_argument("--output", default=None, help="default: <weights>.npz")
    c.add_argument("--x-d", type=int, default=1)
    c.add_argument("--io-shape", type=int, nargs=3, default=None,
                   help="override h w d (default: parsed from filename)")
    c.add_argument("--squeeze-factor", type=int, nargs="*", default=None)
    c.add_argument("--res-blocks", type=int, nargs="*", default=None)
    c.add_argument("--kernels", type=int, nargs="*", default=None)
    c.add_argument("--cardinality", type=int, nargs="*", default=None)
    c.add_argument("--ksize", type=int, default=None)
    c.add_argument("--layer-norm", action="store_true", default=None)
    c.add_argument("--no-layer-norm", dest="layer_norm", action="store_false")
    c.add_argument("--true-grouped-conv", action="store_true",
                   help="import for the DOCUMENTED grouped-conv semantics "
                   "instead of the reference's actual runtime behavior "
                   "(its late-bound group slices, PARITY.md §2). Kernel "
                   "shapes are identical; only apply-time semantics differ")

    t = sub.add_parser("toy", help="import a toy .npy weights checkpoint")
    t.add_argument("--weights", required=True)
    t.add_argument("--mask-indices", required=True,
                   help="the mask_indices_… .npy saved with the weights — "
                   "part of the model identity (TOYcINN.py:306-317)")
    t.add_argument("--output", default=None, help="default: <weights>.npz")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    from arl_conditional_normalizing_flows_tpu.convert import (
        import_conv_h5,
        import_toy_npy,
        parse_conv_filename,
    )
    from arl_conditional_normalizing_flows_tpu.train import save_params_npz

    out_path = args.output or os.path.splitext(args.weights)[0] + ".npz"
    if args.kind == "toy":
        params, mask_indices, cfg = import_toy_npy(
            args.weights, args.mask_indices
        )
        save_params_npz(
            out_path, params, extra={"mask_indices": np.asarray(mask_indices)}
        )
        print(
            f"imported {len(mask_indices)} coupling layers "
            f"(ID {cfg.intermediate_dims}, NL {cfg.num_layers}) -> {out_path}"
        )
        return out_path

    from arl_conditional_normalizing_flows_tpu.models import (
        ConvFlowConfig,
        arch_string,
    )

    try:
        kw = parse_conv_filename(os.path.basename(args.weights))
    except AssertionError:
        kw = {}
        needed = ("io_shape", "squeeze_factor", "res_blocks", "kernels",
                  "cardinality", "ksize")
        missing = [f for f in needed if getattr(args, f, None) is None]
        assert not missing, (
            "filename does not encode the architecture "
            f"(conv_cINN.py:639-641); pass explicit flags for: {missing}"
        )
    overrides = {
        "io_shape": args.io_shape,
        "squeeze_factor_blocks": args.squeeze_factor,
        "res_blocks": args.res_blocks,
        "num_kernels": args.kernels,
        "cardinality": args.cardinality,
        "ksize": args.ksize,
        "layer_norm": args.layer_norm,
    }
    for k, v in overrides.items():
        if v is not None:
            kw[k] = tuple(v) if isinstance(v, list) else v
    cfg = ConvFlowConfig(
        x_d=args.x_d,
        ref_compat_group_slice=not args.true_grouped_conv,
        **kw,
    )
    params = import_conv_h5(args.weights, cfg)
    save_params_npz(
        out_path, params, extra={"arch": np.asarray(arch_string(cfg))}
    )
    print(f"imported arch {arch_string(cfg)} -> {out_path}")
    return out_path


def cli():
    main()
    return 0


if __name__ == "__main__":
    cli()
