"""Checkpoint / resume with architecture metadata.

The reference's checkpoint identity is fragile: the toy model silently
invalidates on a different random mask order (TOYcINN.py:306-317, :228-235)
and the conv model encodes the architecture into the FILENAME as the
compatibility contract (conv_cINN.py:519,639-641; README.md:98).  Here the
architecture config AND the layer-order permutation are stored INSIDE the
checkpoint and validated on restore.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _config_to_json(cfg) -> str:
    d = dataclasses.asdict(cfg)
    return json.dumps(d, sort_keys=True)


# arch.json dicts written before the four lowering booleans collapsed into
# the single ``experimental_lowering`` knob (ConvFlowConfig) carry the old
# keys; map them to the equivalent value so pre-rename checkpoint directories
# keep restoring (they describe the IDENTICAL architecture).
_LEGACY_LOWERING_KEYS = {
    "use_pallas_coupling": "pallas_coupling",
    "fuse_dilated_conv": "fused_dilated",
    "dense_masked_groups": "dense_groups",
    "fused_pallas_subnet": "pallas_subnet",
}


def _normalize_meta(d: dict, config=None) -> dict:
    if any(k in d for k in _LEGACY_LOWERING_KEYS):
        lowering = None
        for old_key, value in _LEGACY_LOWERING_KEYS.items():
            if d.pop(old_key, False):
                lowering = value
        d.setdefault("experimental_lowering", lowering)
    # fields ADDED to the config dataclass after a checkpoint was written are
    # absent from its stored dict; fill them with the dataclass defaults so
    # old checkpoints of the identical architecture keep restoring (a stored
    # value that DIFFERS from the current config still mismatches)
    if config is not None:
        for f in dataclasses.fields(config):
            if f.name in d:
                continue
            if f.default is not dataclasses.MISSING:
                default = f.default
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                default = f.default_factory()  # type: ignore[misc]
            else:
                continue
            # json round-trip so injected defaults compare equal to the
            # json-loaded current meta (tuples become lists, etc.)
            d[f.name] = json.loads(json.dumps(default))
    return d


class CheckpointManager:
    """Orbax-backed checkpoints of (params, opt_state, epoch) + arch metadata."""

    def __init__(self, directory: str, config=None, max_to_keep: int = 3,
                 create: bool = True):
        """``create=False`` opens an EXISTING checkpoint directory for
        restore: a missing/empty directory raises instead of being silently
        created and then 'restored' into an untrained model."""
        self.directory = os.path.abspath(directory)
        if not create and not os.path.isdir(self.directory):
            raise FileNotFoundError(
                f"checkpoint directory does not exist: {self.directory}"
            )
        os.makedirs(self.directory, exist_ok=True)
        self.config = config
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        if not create and self._mgr.latest_step() is None:
            raise FileNotFoundError(
                f"no checkpoint steps found in {self.directory}"
            )
        self._meta_path = os.path.join(self.directory, "arch.json")
        if config is not None:
            self._write_or_check_meta(write=create)

    def _write_or_check_meta(self, write: bool = True):
        meta = _config_to_json(self.config)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                existing = f.read()
            # compare as normalized dicts, not raw strings: legacy key
            # spellings / missing later-added fields of the same
            # architecture must not fail restore
            if _normalize_meta(
                json.loads(existing), self.config
            ) != _normalize_meta(json.loads(meta)):
                raise ValueError(
                    "checkpoint directory was written with a different "
                    f"architecture:\n  stored: {existing}\n  current: {meta}\n"
                    "(the reference encodes this contract in filenames, "
                    "conv_cINN.py:519; here it is enforced)"
                )
        elif write:
            with open(self._meta_path, "w") as f:
                f.write(meta)

    def save(self, epoch: int, state):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        # orbax's should_save silently skips steps <= latest (the final
        # best-params save after an early stop would be DISCARDED when a
        # cadence checkpoint already wrote that epoch) — delete-then-force
        # makes save() unconditional
        latest = self._mgr.latest_step()
        if latest is not None and epoch <= latest:
            if epoch in self._mgr.all_steps():
                self._mgr.delete(epoch)
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload), force=True)
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into an existing (freshly created) TrainState."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            return None, state
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        return epoch, state

    def close(self):
        self._mgr.close()


def save_params_npz(path: str, params, extra: Optional[dict] = None):
    """Flat single-file export (the toy reference's .npy object-array
    save, TOYcINN.py:306-317, minus the pickle)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for kp, leaf in flat:
        arrays[jax.tree_util.keystr(kp)] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            arrays[f"__extra__{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_npz_extras(path: str) -> dict:
    """Read the ``__extra__*`` side-channel values (e.g. the toy model's
    mask-order permutation, part of the model identity — TOYcINN.py:174,
    :228-235) written by :func:`save_params_npz`."""
    data = np.load(path, allow_pickle=False)
    prefix = "__extra__"
    return {k[len(prefix):]: data[k] for k in data.files if k.startswith(prefix)}


def load_params_npz(path: str, params_template):
    """Load a flat export back into the template's tree structure."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for kp, leaf in flat:
        arr = data[jax.tree_util.keystr(kp)]
        assert arr.shape == np.shape(leaf), (kp, arr.shape, np.shape(leaf))
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
