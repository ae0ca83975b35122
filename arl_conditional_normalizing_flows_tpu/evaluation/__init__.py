from arl_conditional_normalizing_flows_tpu.evaluation.stats import (  # noqa: F401
    bits_per_dim,
    latent_normality_stats,
    sector_fidelity,
    moment_match_report,
    sr_residual_block_sums,
    y_identity_error,
)
