"""Pure-function flow primitives (the TPU-native analogue of the reference's
layer-level TF ops)."""

from arl_conditional_normalizing_flows_tpu.ops import masks  # noqa: F401
from arl_conditional_normalizing_flows_tpu.ops import coupling  # noqa: F401
from arl_conditional_normalizing_flows_tpu.ops import squeeze  # noqa: F401
from arl_conditional_normalizing_flows_tpu.ops import resample  # noqa: F401
from arl_conditional_normalizing_flows_tpu.ops import logit  # noqa: F401
from arl_conditional_normalizing_flows_tpu.ops import noise  # noqa: F401
