"""CheckpointManager behaviors: unconditional save, restore-only mode,
architecture contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arl_conditional_normalizing_flows_tpu.models import ToyCINN, ToyConfig
from arl_conditional_normalizing_flows_tpu.train import create_train_state
from arl_conditional_normalizing_flows_tpu.train.checkpoints import (
    CheckpointManager,
)

CFG = ToyConfig(num_coupling_layers=4, intermediate_dims=8, num_layers=1)


def _state(seed=0):
    model = ToyCINN(CFG)
    return create_train_state(model, jnp.zeros((2, 3)), 1e-3, seed=seed)


def test_save_same_epoch_overwrites(tmp_path):
    """orbax silently skips saves at steps <= latest; our save() must be
    unconditional — the final best-params save after early stopping lands on
    an epoch a cadence checkpoint already wrote."""
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, config=CFG)
    s1, s2 = _state(0), _state(1)
    mgr.save(5, s1)
    mgr.save(5, s2)  # same epoch, DIFFERENT params — must persist s2
    ep, restored = mgr.restore(_state(2))
    mgr.close()
    assert ep == 5
    l_restored = jax.tree_util.tree_leaves(restored.params)
    l_s2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l_restored, l_s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_older_epoch_persists(tmp_path):
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, config=CFG)
    mgr.save(7, _state(0))
    s_old = _state(3)
    mgr.save(4, s_old)  # below latest — still must be saved
    ep, restored = mgr.restore(_state(2), epoch=4)
    mgr.close()
    assert ep == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(s_old.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_only_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path / "nope"), config=CFG, create=False)
    # and it must NOT have minted the directory
    assert not (tmp_path / "nope").exists()


def test_restore_only_empty_dir_raises(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(d), config=CFG, create=False)
    # restore-only mode must not seed arch.json into a foreign directory
    assert not (d / "arch.json").exists()


def test_arch_contract_enforced(tmp_path):
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, config=CFG)
    mgr.save(0, _state(0))
    mgr.close()
    other = ToyConfig(num_coupling_layers=6, intermediate_dims=8, num_layers=1)
    with pytest.raises(ValueError, match="different"):
        CheckpointManager(d, config=other)


def test_legacy_lowering_keys_restore(tmp_path):
    """arch.json files written before the four lowering booleans collapsed
    into ``experimental_lowering`` must still restore: same architecture,
    older key spelling (ADVICE r2 medium)."""
    import dataclasses
    import json

    from arl_conditional_normalizing_flows_tpu.models import ConvFlowConfig

    cfg = ConvFlowConfig(
        io_shape=(4, 4, 2), x_d=1, squeeze_factor_blocks=(0,),
        res_blocks=(1,), num_kernels=(8,), cardinality=(2,),
    )
    d = tmp_path / "ck"
    d.mkdir()
    legacy = dataclasses.asdict(cfg)
    # a genuinely OLD arch.json: the pre-rename lowering booleans, and NO
    # fields added to the dataclass after it was written (a round-2 review
    # caught that fabricating from the CURRENT asdict masks this case)
    del legacy["experimental_lowering"]
    del legacy["late_head_cast"]
    legacy.update(
        use_pallas_coupling=False, fuse_dilated_conv=False,
        dense_masked_groups=False, fused_pallas_subnet=False,
    )
    (d / "arch.json").write_text(json.dumps(legacy, sort_keys=True))
    # must NOT raise despite the raw strings differing
    mgr = CheckpointManager(str(d), config=cfg)
    mgr.close()

    # a legacy file with a lowering ENABLED maps to the named value...
    legacy["use_pallas_coupling"] = True
    (d / "arch.json").write_text(json.dumps(legacy, sort_keys=True))
    cfg_pallas = dataclasses.replace(cfg, experimental_lowering="pallas_coupling")
    mgr = CheckpointManager(str(d), config=cfg_pallas)
    mgr.close()
    # ...and still rejects a config whose lowering does not match
    with pytest.raises(ValueError, match="different"):
        CheckpointManager(str(d), config=cfg)
