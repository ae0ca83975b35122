"""Quantitative evaluation — the measurable core of the reference's visual
verification harness (TOYcINN.py:321-1206) plus the parity metrics from
BASELINE.md.

The reference checks correctness by eye: forward-mapped data should look
N(0,1); inverse-mapped prior draws at fixed y should reproduce the class
manifold; SR residual 2x2 blocks should sum to ~0 (conv_cINN.py:44-45).
These functions turn each of those into numbers.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax.numpy as jnp


def bits_per_dim(nll_x_nats: float, num_x_dims: int) -> float:
    """Convert an x-NLL in nats (z term + detJ term) to bits/dim."""
    return float(nll_x_nats) / (math.log(2.0) * num_x_dims)


def latent_normality_stats(z) -> Dict[str, float]:
    """How close the encoded latent is to N(0, I): per-dim mean/std deviation
    and excess kurtosis (the quantitative version of the reference's
    'forward map should produce N(0,1)' eyeball check, TOYcINN.py:340-440)."""
    z = np.asarray(z).reshape(len(z), -1)
    mean = z.mean(0)
    std = z.std(0)
    c = (z - mean) / np.maximum(std, 1e-12)
    kurt = (c**4).mean(0) - 3.0
    return {
        "mean_abs_mean": float(np.abs(mean).mean()),
        "mean_abs_std_err": float(np.abs(std - 1.0).mean()),
        "mean_abs_excess_kurtosis": float(np.abs(kurt).mean()),
    }


def moment_match_report(samples, reference) -> Dict[str, float]:
    """Max/mean absolute difference between sample and reference moments —
    the Monte-Carlo parity statistic (BASELINE.md north star)."""
    s = np.asarray(samples).reshape(len(samples), -1)
    r = np.asarray(reference).reshape(len(reference), -1)
    dm = np.abs(s.mean(0) - r.mean(0))
    ds = np.abs(s.std(0) - r.std(0))
    # MC standard error scale for context
    se = r.std(0) / math.sqrt(len(s))
    return {
        "max_mean_diff": float(dm.max()),
        "mean_mean_diff": float(dm.mean()),
        "max_std_diff": float(ds.max()),
        "mean_std_diff": float(ds.mean()),
        "mc_standard_error": float(se.mean()),
    }


def y_identity_error(xy_sampled, y_requested, x_d: int) -> Dict[str, float]:
    """||f_Y^-1 output y - requested y'|| — the identity the lambda_y loss
    enforces (TOYcINN_make_model.py:142-143)."""
    y = np.asarray(xy_sampled)[..., x_d:]
    yr = np.broadcast_to(np.asarray(y_requested), y.shape)
    err = np.abs(y - yr)
    return {"mean_abs": float(err.mean()), "max_abs": float(err.max())}


def sr_residual_block_sums(x_residual) -> Dict[str, float]:
    """2x2 block sums of an SR residual — designed to be ~0
    (conv_cINN.py:44-45): x = down(hires) - up(down(down(hires))) has
    zero-mean 2x2 blocks by construction."""
    x = np.asarray(x_residual)
    b, h, w, d = x.shape
    blocks = x.reshape(b, h // 2, 2, w // 2, 2, d).sum(axis=(2, 4))
    return {
        "mean_abs_block_sum": float(np.abs(blocks).mean()),
        "max_abs_block_sum": float(np.abs(blocks).max()),
    }


def sector_fidelity(samples_xy, center: float, sector_width: float,
                    x_d: int = 2) -> Dict[str, float]:
    """Conditional-fidelity metrics for one sector of the continuous-sectors
    task (TOYcINN_make_datasets.py:1114-1300): circular angular error of the
    sampled points vs the requested center, the fraction landing inside the
    requested sector, and the fraction inside the (slightly padded) unit
    disk. Shared by the toy driver's inline eval and tools/sector_eval.py so
    the metric definition cannot drift between them."""
    s = np.asarray(samples_xy)
    ang = np.arctan2(s[:, 1], s[:, 0]) % (2 * np.pi)
    err = np.abs(((ang - center + np.pi) % (2 * np.pi)) - np.pi)
    radius = np.hypot(s[:, 0], s[:, 1])
    out = {
        "mean_abs_angular_error": float(err.mean()),
        "frac_in_sector": float((err <= sector_width / 2).mean()),
        "frac_in_unit_disk": float((radius <= 1.05).mean()),
    }
    if s.shape[1] > x_d:
        out["y_identity_mean"] = float(s[:, x_d:].mean())
    return out
