"""Dataset build driver (create_tfrecords.py as a CLI).

Converts an image dataset into the native .cnfrec record files: one combined
file per split for SR training, or one file per class for class-conditional
training (create_tfrecords.py:54-67), then verifies them
(create_tfrecords.py:366-400).
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "fashion_mnist", "synthetic"])
    p.add_argument("--which-classes", type=int, nargs="*", default=list(range(10)))
    p.add_argument("--combined", action="store_true",
                   help="one combined file (SR); default is per-class files")
    p.add_argument("--outdir", required=True)
    p.add_argument("--verify", action="store_true", default=True)
    p.add_argument("--no-verify", dest="verify", action="store_false")
    p.add_argument("--plot", action="store_true",
                   help="write a decoded-image verification grid per file "
                   "(the reference's visual verify, create_tfrecords.py:366-400)")
    p.add_argument("--tfrecords", action="store_true",
                   help="ALSO write reference-format .tfrecords files "
                   "(byte-compatible with create_tfrecords.py output, incl. "
                   "its naming scheme) so the data can feed the original "
                   "TF codebase")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.which_classes:  # nargs='*' permits an empty list
        raise SystemExit(
            "cnf-build-records: --which-classes must name at least one class "
            "(an empty list would write zero files)"
        )
    from arl_conditional_normalizing_flows_tpu.data.images import (
        load_image_dataset,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.data.records import (
        verify_records,
        write_class_sorted_dataset,
    )

    written = []
    for split in ("train", "test"):
        if args.dataset == "synthetic":
            n = 256 if split == "train" else 64
            x, y = synthetic_digits(num_per_class=n, seed=0 if split == "train" else 1)
        else:
            x, y = load_image_dataset(args.dataset, split)
        written += write_class_sorted_dataset(
            args.outdir, split, x, y, args.which_classes, args.combined
        )
        if args.tfrecords:
            tf_written = _write_reference_tfrecords(args, split, x, y)
            print(f"wrote reference-format files: {tf_written}")
    print(f"wrote {len(written)} files to {args.outdir}")
    if args.verify:
        report = verify_records(written)
        print(json.dumps({k: {**v, "shape": list(v["shape"])} for k, v in report.items()}, indent=2))
    if args.plot:
        from arl_conditional_normalizing_flows_tpu.data.records import read_records
        from arl_conditional_normalizing_flows_tpu.evaluation import plots

        for path in written:
            arr = read_records(path)
            plots.plot_image_grid(
                arr[:8], path + ".png", ncols=8, title=path.rsplit("/", 1)[-1]
            )
    return written


def _write_reference_tfrecords(args, split, x, y):
    """Reference-format sidecar output: byte-compatible .tfrecords with the
    reference's naming scheme (create_tfrecords.py:307-309,360-364 —
    ``x_{train|val}_{dataset}_c<classes>.tfrecords``; one combined file or
    one per class) and 10-wide one-hot labels (create_tfrecords.py:330-334)."""
    import os

    import numpy as np

    from arl_conditional_normalizing_flows_tpu.data.tfrecord_compat import (
        write_reference_tfrecords,
    )

    split_name = "train" if split == "train" else "val"
    x = np.asarray(x, np.float32)
    y = np.asarray(y).astype(int)
    onehot_width = max(10, int(max(args.which_classes)) + 1)
    groups = [list(args.which_classes)] if args.combined else [
        [c] for c in args.which_classes
    ]
    paths = []
    for group in groups:
        cs = "".join(str(c) for c in group)
        sel = np.isin(y, group)
        imgs, ys = x[sel], y[sel]
        onehot = np.zeros((len(imgs), onehot_width), np.float32)
        onehot[np.arange(len(imgs)), ys] = 1.0
        path = os.path.join(
            args.outdir, f"x_{split_name}_{args.dataset}_c{cs}.tfrecords"
        )
        write_reference_tfrecords(path, imgs, onehot)
        paths.append(path)
    return paths


def cli():
    """Console-script entry: discard the return value so setuptools'
    sys.exit(main()) doesn't print it and exit nonzero."""
    main()
    return 0


if __name__ == "__main__":
    cli()
