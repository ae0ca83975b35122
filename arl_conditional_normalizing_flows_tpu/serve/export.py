"""AOT serving artifacts: export the conditional sampler to StableHLO.

The reference has no deployment story at all — inference means loading Keras
weights inside the training script and running the model in Python
(TOYcINN.py:228-235, conv_cINN.py:572-579). For production serving on TPU we
instead export the *sampling function* (inverse flow + post-processing) as a
self-contained, versioned StableHLO artifact via ``jax.export``:

- the trained parameters are baked into the artifact as constants — the
  serving side needs no Python model code, no flax, no checkpoint format;
- the PRNG stays host-side: the exported function takes the latent draw ``z``
  (and the condition) as INPUTS, so the serving system controls determinism
  and can replay/shard draws however it likes;
- the batch dimension is exported SYMBOLICALLY (``jax.export.symbolic_shape``)
  by default, so one artifact serves any batch size;
- artifacts carry a JSON sidecar (shapes, dtypes, platforms, arch string)
  and the StableHLO bytes are portable across machines and JAX versions
  (within jax.export's compatibility guarantees).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from arl_conditional_normalizing_flows_tpu.sample.sampler import (
    postprocess_sampled_xy,
)


def make_image_serving_fn(
    model,
    params,
    x_d: int,
    *,
    de_logit: bool = False,
    residual: bool = False,
    logit_a: float = 0.01,
    quantize_uint8: bool = False,
):
    """``f(z, y) -> x`` for conv models: z (B,H,W,x_d) latent draw, y
    (B,H,W,y_d) condition plane (class plane or upsampled low-res image);
    returns x (B,H,W,x_d) after optional de-logit / SR-residual
    reconstruction — the SAME ``sample.sampler.postprocess_sampled_xy`` the
    local sampler applies, so served artifacts can never drift from local
    sampling.

    ``quantize_uint8`` returns 8-bit pixels (round(clip(x,0,1)*255)) instead
    of float32: a 4x smaller device->host readback, which dominates per-call
    serving latency on remote-attached devices. Appropriate for image
    payloads (the source data is 8-bit, create_tfrecords.py:91-103); leave
    off when the caller needs the continuous values."""

    def fn(z, y):
        xy = model.apply(params, z, y, method="sample_xy")
        x = postprocess_sampled_xy(
            xy, y, x_d, de_logit=de_logit, residual=residual, logit_a=logit_a
        )
        if quantize_uint8:
            x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return x

    return fn


def make_toy_serving_fn(model, params, x_d: int):
    """``f(z, y) -> xy`` for toy models: z (B, x_d), y (B, y_d)."""

    def fn(z, y):
        assert z.shape[-1] == x_d, (z.shape, x_d)
        zy = jnp.concatenate([z, y], axis=-1)
        return model.apply(params, zy, method="inverse")

    return fn


def make_multidraw_fn(fn):
    """Amortize per-call dispatch: one serving call computes MANY draws.

    Wraps a single-draw sampler ``f(z, y) -> x`` (z: (B, ...), y: (B, ...))
    into ``g(z_stack, y) -> x_stack`` with z_stack shaped (D, B, ...) — D
    independent latent draws for the SAME batch of conditions — returning
    (D, B, ...) samples from ONE device dispatch.

    Rationale: each artifact call costs a fixed host round-trip (~40-120 ms
    through a loaded host / remote-device tunnel; docs/PERF_NOTES.md), which
    collapsed per-call serving throughput to ~8% of device-side speed. The
    draws are FOLDED INTO THE BATCH axis (reshape, not a scan/vmap over
    programs) so the device sees one large batch — the fastest shape on TPU —
    and the dispatch cost is paid once per D draws. Conditional fan-out
    ("sample N x's for this y", TOYcINN.py:438-448) is the dominant serving
    pattern for a conditional flow, so this is the default entry to export.

    Note: D*B is the effective device batch; keep it under the compile-size
    ceiling of the deployment (this environment's remote compile helper
    rejects flagship batches >= 4096).
    """

    def multi(z_stack, y):
        d = z_stack.shape[0]
        b = z_stack.shape[1]
        y_rep = jnp.broadcast_to(y[None], (d,) + y.shape)
        flat_z = z_stack.reshape((d * b,) + z_stack.shape[2:])
        flat_y = y_rep.reshape((d * b,) + y.shape[1:])
        x = fn(flat_z, flat_y)
        return x.reshape((d, b) + x.shape[1:])

    return multi


def export_sampler(
    fn,
    arg_shapes: Sequence[Tuple[int, ...]],
    *,
    symbolic_batch: bool = True,
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
) -> jexport.Exported:
    """Export ``fn(*args)`` with the given per-argument shapes.

    ``arg_shapes`` EXCLUDE the batch dimension; a shared leading batch dim is
    added to every argument — symbolic (any batch size at serving time) by
    default, or fixed at 1 when ``symbolic_batch=False``.
    ``platforms`` defaults to the current backend; pass e.g. ("tpu", "cpu")
    to cross-compile one artifact for both.
    """
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = 1
    specs = [jax.ShapeDtypeStruct((b,) + tuple(s), dtype) for s in arg_shapes]
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def make_seeded_multidraw_fn(fn, draws: int, z_shape: Tuple[int, ...]):
    """Throughput serving entry: ``g(seed, y) -> x_stack`` with the latent
    drawn ON DEVICE.

    The default artifacts take ``z`` as an input (host-controlled PRNG —
    replayable, shardable). But uploading D x B x H x W x x_d float32 latents
    costs as much wire time as reading the samples back; on remote-attached
    devices that upload dominates the call. Here the host sends ONE int32
    seed; the device draws ``z = normal(fold_in(seed), (D, B) + z_shape)``
    and runs the multidraw path. Determinism is preserved (same seed + shapes
    -> same samples); only the ability to inject custom latents is traded
    away. ``draws`` is baked static; the condition batch stays symbolic."""

    multi = make_multidraw_fn(fn)

    def g(seed, y):
        b = y.shape[0]
        key = jax.random.PRNGKey(seed)
        z_stack = jax.random.normal(
            key, (draws, b) + tuple(z_shape), jnp.float32
        )
        return multi(z_stack, y)

    return g


def export_seeded_multidraw_sampler(
    fn,
    draws: int,
    z_shape: Tuple[int, ...],
    y_shape: Tuple[int, ...],
    *,
    symbolic: bool = True,
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
) -> jexport.Exported:
    """Export :func:`make_seeded_multidraw_fn` with seed () int32 and
    y (b, *y_shape)."""
    if symbolic:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = 1
    g = make_seeded_multidraw_fn(fn, draws, z_shape)
    specs = [
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((b,) + tuple(y_shape), dtype),
    ]
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(g), **kwargs)(*specs)


def export_multidraw_sampler(
    fn,
    z_shape: Tuple[int, ...],
    y_shape: Tuple[int, ...],
    *,
    symbolic: bool = True,
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
) -> jexport.Exported:
    """Export ``make_multidraw_fn(fn)`` with z (d, b, *z_shape) and
    y (b, *y_shape); ``d`` (draws per call) and ``b`` (conditions) are both
    symbolic by default, so ONE artifact serves any fan-out."""
    if symbolic:
        d, b = jexport.symbolic_shape("d, b")
    else:
        d, b = 1, 1
    multi = make_multidraw_fn(fn)
    specs = [
        jax.ShapeDtypeStruct((d, b) + tuple(z_shape), dtype),
        jax.ShapeDtypeStruct((b,) + tuple(y_shape), dtype),
    ]
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(multi), **kwargs)(*specs)


class PipelinedSampler:
    """Client-side throughput wrapper for a SEEDED multidraw artifact.

    Keeps ``n_in_flight`` calls outstanding so transport (dispatch +
    readback) overlaps device compute — measured on the remote-attached
    v5e this lifts steady-state serving from ~19% to **56% of the
    device-side sampling rate** (saturating at ~8 in-flight calls;
    docs/PERF_NOTES.md serving probe). Deterministic: chunk k uses seed
    ``start_seed + k``, so results are independent of thread scheduling
    and identical to sequential calls.

    Args:
        exported: a (loaded or fresh) ``export_seeded_multidraw_sampler``
            artifact — signature ``(seed: int32, y) -> (D, B, ...)``.
        draws_per_call: the D baked into the artifact.
        n_in_flight: outstanding calls (4-8 saturates a remote chip;
            1 = plain sequential calls).
    """

    def __init__(self, exported, draws_per_call: int, n_in_flight: int = 4):
        self._exported = exported
        self._draws = draws_per_call
        self._n = max(1, n_in_flight)

    def sample(self, y, total_draws: int, start_seed: int = 0):
        """>= ``total_draws`` conditional samples per condition row of ``y``.

        Returns a numpy array (ceil(total/D)*D, B, ...) stacked in seed
        order (trim to ``total_draws`` if an exact count is needed).
        """
        import concurrent.futures as cf

        import numpy as np

        if total_draws < 1:
            raise ValueError(f"total_draws must be >= 1, got {total_draws}")
        n_calls = -(-total_draws // self._draws)

        def one(k):
            return np.asarray(
                self._exported.call(jnp.int32(start_seed + k), y)
            )

        with cf.ThreadPoolExecutor(max_workers=self._n) as pool:
            chunks = list(pool.map(one, range(n_calls)))
        return np.concatenate(chunks, axis=0)


def save_artifact(path: str, exported: jexport.Exported, metadata: Optional[dict] = None):
    """Write ``<path>`` (serialized StableHLO) + ``<path>.json`` sidecar."""
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    side = {
        "format": "jax.export.Exported",
        "fun_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        "nr_bytes": len(data),
        # caller metadata is nested so it can never clobber the ground-truth
        # fields derived from the Exported object above
        "metadata": dict(metadata or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=2)
    return side


def load_artifact(path: str) -> jexport.Exported:
    """Load a serialized artifact; invoke it with ``loaded.call(*args)``."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
