from arl_conditional_normalizing_flows_tpu.data import images  # noqa: F401
from arl_conditional_normalizing_flows_tpu.data import records  # noqa: F401
from arl_conditional_normalizing_flows_tpu.data import toy_datasets  # noqa: F401
