from arl_conditional_normalizing_flows_tpu.sample.sampler import (  # noqa: F401
    conditional_moments,
    sample_conditional,
    sample_conditional_images,
    sweep_conditions,
)
