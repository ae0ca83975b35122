"""Visualization harness (the TPU-side analogue of the reference's plot code:
TOYcINN.py:321-1206 scatter grids, class-interpolation sweeps, loss curves;
create_tfrecords.py:366-400 image verification panels).

All functions save to files (headless-friendly) and degrade gracefully when
matplotlib is unavailable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_toy_joint(xy, path, title="data"):
    """Scatter of the 2-D point cloud colored by condition
    (TOYcINN.py:340-440 style)."""
    plt = _mpl()
    xy = np.asarray(xy).reshape(-1, xy.shape[-1])
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(xy[:, 0], xy[:, 1], c=xy[:, 2], s=2, cmap="viridis", alpha=0.6)
    fig.colorbar(sc, ax=ax, label="y")
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_toy_conditional_grid(samples_by_condition, conditions, path):
    """One panel per condition value: the conditional manifold x | y'
    (TOYcINN.py:438-757; includes off-manifold sweeps, TOYcINN.py:1115-1206)."""
    plt = _mpl()
    n = len(conditions)
    cols = min(n, 5)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i, (s, c) in enumerate(zip(samples_by_condition, conditions)):
        ax = axes[i // cols][i % cols]
        s = np.asarray(s)
        ax.scatter(s[:, 0], s[:, 1], s=2, alpha=0.5)
        ax.set_title(f"y' = {float(c):.2f}")
        ax.set_aspect("equal")
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_latent(z, path):
    """Forward-mapped latent scatter — should look like N(0, I)."""
    plt = _mpl()
    z = np.asarray(z).reshape(-1, z.shape[-1])
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(z[:, 0], z[:, 1], s=2, alpha=0.5)
    circle = plt.Circle((0, 0), 2.0, fill=False, color="r", ls="--")
    ax.add_patch(circle)
    ax.set_title("latent z (2-sigma circle)")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_loss_curves(history_rows, path, keys=("loss", "z_loss", "y_loss", "detJ_loss")):
    """Training-loss curves (TOYcINN.py:388-393)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 4))
    epochs = [r["epoch"] for r in history_rows]
    for k in keys:
        if history_rows and k in history_rows[0]:
            ax.plot(epochs, [r[k] for r in history_rows], label=k)
    ax.legend()
    ax.set_xlabel("epoch")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_image_grid(images, path, ncols=8, title=None):
    """Sample / verification image grid (create_tfrecords.py:366-400)."""
    plt = _mpl()
    images = np.asarray(images)
    n = len(images)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(1.4 * ncols, 1.4 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i, ..., 0], cmap="gray")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_sr_comparison(lowres_y, samples, truth, path, n=6):
    """Side-by-side SR panel: condition (upsampled low-res), model sample(s),
    ground truth."""
    plt = _mpl()
    fig, axes = plt.subplots(3, n, figsize=(1.6 * n, 5), squeeze=False)
    for i in range(n):
        for row, (img, label) in enumerate(
            [(lowres_y, "y (low-res)"), (samples, "sample"), (truth, "truth")]
        ):
            ax = axes[row][i]
            ax.axis("off")
            ax.imshow(np.asarray(img)[i, ..., 0], cmap="gray")
            if i == 0:
                ax.set_title(label, loc="left", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
