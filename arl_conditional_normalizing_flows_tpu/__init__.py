"""TPU-native conditional normalizing flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``USArmyResearchLab/ARL_Conditional_Normalizing_Flows``: RealNVP-style
*conditional* invertible networks trained by maximizing the likelihood of the
joint (data, condition) distribution

    -log p_{X,Y'}(x, y') = -log p_Z(f_Z(x, y'))
                           + lambda_y * ||f_Y(x, y') - y'||_1
                           - log |det J_f(x, y')|

(reference: TOYcINN_make_model.py:281-285, conv_cINN_make_model.py:1707-1709)
and sampled conditionally by drawing z ~ N(0, 1), concatenating the desired
condition, and running the inverse map (reference: TOYcINN.py:438-448).

Unlike the reference (two divergent TF implementations with opposite direction
conventions), this package has ONE flow core with ONE convention:

    ``forward``:  xy' -> zy   (encode; accumulates per-sample log|det J|)
    ``inverse``:  zy  -> xy'  (decode / sampling)

Subpackages
-----------
- ``ops``      pure-function flow primitives (masks, coupling laws, squeeze/
               factor, resampling, logit transforms, instance noise) plus
               Pallas TPU kernels for the fused coupling law.
- ``models``   flax.linen models: the dense toy cINN and the multi-scale
               convolutional cFlow, with ResNeXt dilated coupling subnets.
- ``data``     pure-JAX toy dataset samplers, a native record format for image
               datasets, preprocessing (logit / super-resolution / class
               conditioning), class-pure batching, sharded host feeding.
- ``train``    jit/pjit training engine: joint-NLL step, instance-noise
               annealing, early stopping, orbax checkpointing, metric logging.
- ``sample``   conditional sampling engine: sharded sample fan-out, condition
               sweeps, moment statistics, de-logit / residual reconstruction.
- ``parallel`` mesh construction and sharding helpers (DP over pod slices).
"""

__version__ = "0.1.0"

from arl_conditional_normalizing_flows_tpu import ops  # noqa: F401
