from arl_conditional_normalizing_flows_tpu.utils.profiling import (  # noqa: F401
    annotate,
    profile_trace,
    step_timer,
)
