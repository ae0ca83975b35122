from arl_conditional_normalizing_flows_tpu.models.arch import (  # noqa: F401
    ConvFlowConfig,
    ToyConfig,
    arch_string,
    derive_blocks,
    perf_arch_config,
    shuffle_mask_indices,
)
from arl_conditional_normalizing_flows_tpu.models.conv import (  # noqa: F401
    ConvCFlow,
    ConvCouplingLayer,
)
from arl_conditional_normalizing_flows_tpu.models.toy import ToyCINN  # noqa: F401
