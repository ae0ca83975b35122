"""Serving/deployment: AOT StableHLO export of the conditional sampler."""

from arl_conditional_normalizing_flows_tpu.serve.export import (
    PipelinedSampler,
    export_multidraw_sampler,
    export_seeded_multidraw_sampler,
    export_sampler,
    load_artifact,
    make_image_serving_fn,
    make_multidraw_fn,
    make_seeded_multidraw_fn,
    make_toy_serving_fn,
    save_artifact,
)

__all__ = [
    "PipelinedSampler",
    "export_multidraw_sampler",
    "export_seeded_multidraw_sampler",
    "export_sampler",
    "load_artifact",
    "make_image_serving_fn",
    "make_multidraw_fn",
    "make_seeded_multidraw_fn",
    "make_toy_serving_fn",
    "save_artifact",
]
