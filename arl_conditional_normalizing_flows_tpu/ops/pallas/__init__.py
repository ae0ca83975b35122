from arl_conditional_normalizing_flows_tpu.ops.pallas.affine_coupling import (  # noqa: F401
    fused_affine_forward,
    fused_affine_inverse,
)
