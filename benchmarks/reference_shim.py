"""Import shims for running the UNMODIFIED reference code (read-only at
/root/reference) under this image's TF/Keras 3 stack, for parity measurement
only.

- stubs ``tensorflow_probability`` with a unit-scale MultivariateNormalDiag
  (the only TFP symbol the reference uses);
- patches Keras-2-isms after import (``Input(shape=<int>)``).

Nothing here is part of the framework; it exists so PARITY.md numbers can be
regenerated against the actual reference implementation.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_PATH = os.environ.get("CNF_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH) and os.path.exists(
        os.path.join(REFERENCE_PATH, "TOYcINN_make_model.py")
    )


def install_tfp_stub():
    if "tensorflow_probability" in sys.modules:
        return
    import tensorflow as tf

    tfp = types.ModuleType("tensorflow_probability")

    class MVNDiag:
        def __init__(self, loc, scale_diag):
            self.loc = tf.constant(loc, tf.float32)
            self.scale = tf.constant(scale_diag, tf.float32)
            self.d = int(self.loc.shape[0])

        def log_prob(self, z):
            zn = (z - self.loc) / self.scale
            return (
                -0.5 * tf.reduce_sum(tf.square(zn), axis=-1)
                - 0.5 * self.d * np.log(2 * np.pi)
                - tf.reduce_sum(tf.math.log(self.scale))
            )

        def sample(self, n):
            return tf.random.normal((int(n), self.d)) * self.scale + self.loc

    tfp.distributions = types.SimpleNamespace(MultivariateNormalDiag=MVNDiag)
    sys.modules["tensorflow_probability"] = tfp


def import_toy_reference():
    """Import the reference toy model module with Keras-3 compatibility
    patches applied. Returns the module."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    install_tfp_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tensorflow as tf
    import TOYcINN_make_model as ref

    real_input = tf.keras.Input

    def input_compat(shape=None, **kw):
        if isinstance(shape, int):
            shape = (shape,)
        return real_input(shape=shape, **kw)

    ref.Input = input_compat

    # Keras 3 rejects non-tensor positional args in Layer.__call__; the
    # reference calls model(u, direction). Route straight to .call — the
    # flow model owns no variables of its own (all weights live in the
    # per-coupling functional sub-Models), so Keras build machinery isn't
    # needed at this level.
    ref.cINN_affine.__call__ = lambda self, u, direction=-1: self.call(u, direction)
    return ref


def import_conv_reference():
    """Import the reference conv model module (conv_cINN_make_model) with
    compatibility patches: tfp stub, ``np.int`` (removed in numpy>=1.24 but
    used at conv_cINN_make_model.py:1532), and direct-.call routing."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    install_tfp_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001 — harness-local compat for the reference
    import conv_cINN_make_model as cref

    cref.cFlow.__call__ = lambda self, uv, direction=-1: self.call(uv, direction)
    return cref
