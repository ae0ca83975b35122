"""Flagship-arch full-budget (600-epoch) training parity, split into
independently runnable halves so the ~5 h reference TF/CPU leg can run in the
background while the JAX leg runs elsewhere (CPU or TPU).

Reproduces EXACTLY the stream of `parity_conv_train.run_image_parity(
epochs=600, size=28, batch=32, layer_norm=True, num_per_class=64, anneal=100,
arch=flagship)` — the reference driver's full budget (conv_cINN.py:116
num_annealing_epochs=100 + :119 num_epochs=500) on its flagship arch
(conv_cINN.py:56-65: squeeze_factor=[0,1,0,0], NRB=[3,3,3,3],
NK=[64,64,32,32], C=[8,8,4,4], ksize 3, LayerNorm, batch 32) — but
materializes the byte-identical noisy batch stream ONCE to an .npy memmap so
the two implementations can consume it from separate processes.

Usage:
  python benchmarks/flagship_split.py gen  [epochs]          # build stream
  python benchmarks/flagship_split.py genval                 # held-out set
  python benchmarks/flagship_split.py ref  [epochs] [--seed N] [--resume]
         [--val]
  python benchmarks/flagship_split.py ours [epochs] [cpu|tpu] [--seed N]
         [--tag T] [--resume] [--eps E] [--ginit] [--refinit] [--sharedinit]
         [--val]
  python benchmarks/flagship_split.py merge [epochs]         # -> results json

``--val`` legs additionally evaluate the fixed held-out batch set (built by
``genval``: 4x32 fresh seed-1 synthetic images, logit-preprocessed, one baked
noise-floor draw, byte-identical for both implementations) every 10 epochs,
logging val_{loss,z_loss,y_loss,detJ_loss} — the held-out analog of the
reference's monitored ``val_loss`` (conv_cINN.py:334-409, :631-636). They log
to dedicated files (flagship600_{ref|ours}_val[_sN].jsonl, ours sharedinit ->
valshared) so earlier train-NLL seed bands stay immutable; ``merge`` emits
``val_bands`` alongside the train bands.

Hypothesis flags (ours-only, log under --tag): ``--eps`` overrides Adam
epsilon; ``--ginit`` uses per-group-independent orthogonal grouped-conv
init (the reference's init joint distribution); ``--refinit`` transplants
the reference's exact epoch-0 weights (same seed draw run_ref trains from);
``--sharedinit`` uses OUR pipeline's reference-faithful shared-shape init
(ConvFlowConfig.ref_compat_shared_init, models/init_compat.py).
Both training legs checkpoint periodically and honor ``--resume``
(TPU ours legs skip checkpointing: state readback through the remote
tunnel costs more than re-running the leg).

Each training leg appends one JSON line per epoch to
benchmarks/results/flagship600_{ref|ours}.jsonl (resume-safe reporting: a
partial run still yields a trajectory). `merge` combines both logs into
benchmarks/results/conv_train_parity.json under key "image_flagship_600".

``--seed N`` (N != 0) changes ONLY the model-init / optimizer seed — the
materialized batch stream stays byte-identical (its key chain is pinned to
SEED+7 inside ``gen``) — and logs to flagship600_{impl}_s{N}.jsonl. Multi-seed
legs give the run-to-run variance band that a single-trajectory comparison on
a 128-image chaotic problem cannot (VERDICT r2 weak #1). ``merge`` picks up
every per-seed log present and emits per-implementation tail-statistics bands
(last-20-epoch mean loss, best-seen) alongside the seed-0 trajectories.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
STREAM_PATH = os.path.join(RESULTS_DIR, "flagship600_stream.npy")
VAL_PATH = os.path.join(RESULTS_DIR, "flagship600_val.npy")
VAL_EVERY = 10  # epochs between held-out evaluations on --val legs

SEED = 0
SIZE = 28
BATCH = 32
NUM_PER_CLASS = 64
ANNEAL = 100  # min(100, max(4, 600 // 6)) for the 600-epoch budget
LR = 3e-4
ARCH = ((0, 1, 0, 0), (3, 3, 3, 3), (64, 64, 32, 32), (8, 8, 4, 4))
XY_SHAPE = (SIZE, SIZE, 2)
BATCHES_PER_EPOCH = 4  # 2 classes x (64 // 32) class-pure batches


def _noisy(ep: int, i: int, b: np.ndarray) -> np.ndarray:
    """Annealing noise, identical to parity_conv_train.run_image_parity."""
    a = ep / ANNEAL if ep < ANNEAL else 1.0
    if a >= 1.0:
        return np.asarray(b, np.float32)
    eps = np.random.default_rng(ep * 1000 + i).normal(size=b.shape)
    return (a * b + (1 - a) * eps).astype(np.float32)


def gen(epochs: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )

    imgs, labels = synthetic_digits(
        num_per_class=NUM_PER_CLASS, num_classes=2, size=SIZE
    )
    src = ClassConditionalSource(imgs, labels, [0, 1], BATCH, use_logits=True)
    assert src.xy_shape == XY_SHAPE and src.num_batches == BATCHES_PER_EPOCH

    # the SAME epoch-key chain as run_image_parity (prefix-stable in epochs)
    epoch_keys = []
    key = jax.random.PRNGKey(SEED + 7)
    for _ in range(epochs):
        key, k = jax.random.split(key)
        epoch_keys.append(k)

    os.makedirs(RESULTS_DIR, exist_ok=True)
    out = np.lib.format.open_memmap(
        STREAM_PATH,
        mode="w+",
        dtype=np.float32,
        shape=(epochs, BATCHES_PER_EPOCH, BATCH) + XY_SHAPE,
    )
    t0 = time.time()
    for ep in range(epochs):
        for i, b in enumerate(src.epoch(epoch_keys[ep], ep)):
            out[ep, i] = _noisy(ep, i, np.asarray(b))
        if ep % 100 == 0:
            print(f"gen epoch {ep}/{epochs} ({time.time() - t0:.0f}s)", flush=True)
    out.flush()
    print(f"stream written: {STREAM_PATH} ({out.nbytes / 1e6:.0f} MB)", flush=True)


def gen_val() -> None:
    """Fixed held-out batch set for the val-logged legs (VERDICT r4 #1).

    4 x 32 FRESH synthetic images (``synthetic_digits(seed=1)`` — a disjoint
    draw from the training set's seed-0 images), logit-preprocessed through
    the same ``ClassConditionalSource`` path as training (one fixed 2%
    noise-floor draw baked into the bytes — NOT re-drawn per evaluation), no
    annealing noise. Both implementations consume the identical bytes, the
    held-out analog of the reference's ``validation_data`` stream
    (conv_cINN.py:334-409, :631-636)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )

    imgs, labels = synthetic_digits(
        num_per_class=NUM_PER_CLASS, num_classes=2, size=SIZE, seed=1
    )
    src = ClassConditionalSource(imgs, labels, [0, 1], BATCH, use_logits=True)
    assert src.xy_shape == XY_SHAPE and src.num_batches == BATCHES_PER_EPOCH
    batches = [
        np.asarray(b, np.float32)
        for b in src.epoch(jax.random.PRNGKey(SEED + 123), 0)
    ]
    os.makedirs(RESULTS_DIR, exist_ok=True)
    np.save(VAL_PATH, np.stack(batches))
    print(f"val set written: {VAL_PATH} ({len(batches)}x{BATCH})", flush=True)


def _val_set():
    assert os.path.exists(VAL_PATH), "run `flagship_split.py genval` first"
    v = np.load(VAL_PATH)
    assert v.shape == (BATCHES_PER_EPOCH, BATCH) + XY_SHAPE
    return v


def _is_val_epoch(ep1: int, epochs: int) -> bool:
    return ep1 == 1 or ep1 % VAL_EVERY == 0 or ep1 == epochs


def _stream(epochs: int) -> np.ndarray:
    mm = np.load(STREAM_PATH, mmap_mode="r")
    assert mm.shape[0] >= epochs, f"stream has {mm.shape[0]} epochs, need {epochs}"
    return mm


def _log_path(impl: str, seed: int = 0, tag: str = None) -> str:
    suffix = f"_{tag}" if tag else ("" if seed == 0 else f"_s{seed}")
    return os.path.join(RESULTS_DIR, f"flagship600_{impl}{suffix}.jsonl")


def _append(impl: str, row: dict, seed: int = 0, tag: str = None) -> None:
    with open(_log_path(impl, seed, tag), "a") as f:
        f.write(json.dumps(row) + "\n")


def _truncate_log(log_path: str, start_ep: int) -> None:
    """On resume, drop rows past the checkpoint epoch (and dedupe any
    earlier restart overlap, last write wins) so every leg jsonl carries
    exactly one row per epoch — VERDICT r4 weak #5: a 613-row/600-epoch
    artifact is ambiguous to anyone not reading merge's read_log."""
    if not os.path.exists(log_path):
        return
    rows = {}
    with open(log_path) as f:
        for line in f:
            r = json.loads(line)
            if r["epoch"] <= start_ep:
                rows[r["epoch"]] = r
    with open(log_path, "w") as f:
        for e in sorted(rows):
            f.write(json.dumps(rows[e]) + "\n")


def _logged_t(log_path: str, epoch: int) -> float:
    """Cumulative wall-clock recorded in the leg's log at ``epoch`` —
    fallback for resuming pre-ADVICE-fix checkpoints without 'elapsed'."""
    if not os.path.exists(log_path):
        return 0.0
    t = 0.0
    with open(log_path) as f:
        for line in f:
            r = json.loads(line)
            if r["epoch"] <= epoch:
                t = max(t, float(r.get("t", 0.0)))
    return t


def run_ref(epochs: int, seed: int = SEED, resume: bool = False,
            ckpt_every: int = 25, val: bool = False) -> None:
    """``resume=True`` continues from the periodic checkpoint
    (flagship600_ref[_sN].ckpt.npz: model vars + optimizer slots + epoch).
    A TF leg costs 5.5-6 h; without this a crash loses everything
    (round-3 lesson). The resumed trajectory matches a continuous run up to
    TF's CPU-threading nondeterminism (~2.5% epoch-loss spread).

    ``val=True`` additionally evaluates the fixed held-out set (``genval``)
    every VAL_EVERY epochs and logs to flagship600_ref_val[_sN].jsonl —
    round-4 legs stay untouched as the train-NLL record."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from reference_shim import import_conv_reference

    cref = import_conv_reference()
    sf, nrb, nk, card = ARCH
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=list(XY_SHAPE), x_d=1, squeeze_factor_block_list=list(sf),
        ResNeXt_block_list=list(nrb), num_kernels_list=list(nk),
        cardinality_list=list(card), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=True,
    )
    opt = tf.keras.optimizers.Adam(LR)
    var = []
    for l in m.layers_list:
        if isinstance(l, cref.coupling_layer):
            var += l.model_A.trainable_variables + l.model_b.trainable_variables
    opt.build(var)  # create slots now so a checkpoint can restore into them

    tag = None if not val else ("val" if seed == SEED else f"val_s{seed}")
    ck_path = _log_path("ref", seed, tag).replace(".jsonl", ".ckpt.npz")
    start_ep, elapsed0 = 0, 0.0
    if resume and os.path.exists(ck_path):
        d = np.load(ck_path)
        start_ep = int(d["epoch"])
        # cumulative wall-clock across restarts (ADVICE r3: a reset t0 made
        # resumed legs under-report leg time); older checkpoints lack the
        # field — recover it from the log row at the resume epoch
        elapsed0 = float(d["elapsed"]) if "elapsed" in d else _logged_t(
            _log_path("ref", seed, tag), start_ep)
        _truncate_log(_log_path("ref", seed, tag), start_ep)
        for i, v in enumerate(var):
            v.assign(d[f"m{i}"])
        for i, v in enumerate(opt.variables):
            v.assign(d[f"o{i}"])
        print(f"resumed from epoch {start_ep} ({ck_path}, "
              f"{elapsed0:.0f}s elapsed)", flush=True)

    def save_ckpt(ep):
        arrs = {"epoch": np.asarray(ep),
                "elapsed": np.asarray(time.time() - t0)}
        arrs.update({f"m{i}": v.numpy() for i, v in enumerate(var)})
        arrs.update({f"o{i}": v.numpy() for i, v in enumerate(opt.variables)})
        tmp = ck_path + ".tmp.npz"  # savez keeps names already ending .npz
        np.savez(tmp, **arrs)
        os.replace(tmp, ck_path)

    @tf.function
    def rstep(xy):
        with tf.GradientTape() as tape:
            loss, lz, ly, ldj = m.log_loss(xy)
        opt.apply_gradients(zip(tape.gradient(loss, var), var))
        return loss, lz, ly, ldj

    @tf.function
    def vstep(xy):
        return m.log_loss(xy)

    vset = _val_set() if val else None
    mm = _stream(epochs)
    t0 = time.time() - elapsed0
    for ep in range(start_ep, epochs):
        vals = [
            [float(x) for x in rstep(tf.constant(np.ascontiguousarray(mm[ep, i])))]
            for i in range(BATCHES_PER_EPOCH)
        ]
        mean = np.mean(vals, axis=0)
        row = {
            "epoch": ep + 1,
            "loss": round(float(mean[0]), 3),
            "z_loss": round(float(mean[1]), 3),
            "y_loss": round(float(mean[2]), 3),
            "detJ_loss": round(float(mean[3]), 3),
            "t": round(time.time() - t0, 1),
        }
        if val and _is_val_epoch(ep + 1, epochs):
            vv = [
                [float(x) for x in vstep(tf.constant(vset[i]))]
                for i in range(BATCHES_PER_EPOCH)
            ]
            vm = np.mean(vv, axis=0)
            row.update(
                val_loss=round(float(vm[0]), 3),
                val_z_loss=round(float(vm[1]), 3),
                val_y_loss=round(float(vm[2]), 3),
                val_detJ_loss=round(float(vm[3]), 3),
            )
        _append("ref", row, seed, tag)
        if (ep + 1) % ckpt_every == 0 or ep + 1 == epochs:
            save_ckpt(ep + 1)
    print(f"ref done: {epochs} epochs in {time.time() - t0:.0f}s", flush=True)


def _ref_init_params(params, seed):
    """Reference EPOCH-0 weights — the exact ``tf.random.set_seed(seed)``
    draws `run_ref` trains from — transplanted into our param tree via the
    parity_conv conv mapping (LayerNorm/bias inits are deterministic ones/
    zeros in both frameworks, so convs + tanh scales fully determine the
    initial point). An `ours` leg trained from this point isolates
    init-SAMPLE luck from training dynamics at the flagship scale: if it
    reaches the reference band, the tail offset is the init draw; if it
    stays in the ours band, the offset is in the update dynamics."""
    import tensorflow as tf

    from reference_shim import import_conv_reference
    from parity_conv import _map_subnet

    cref = import_conv_reference()
    sf, nrb, nk, card = ARCH
    tf.random.set_seed(seed)
    np.random.seed(seed)
    m = cref.cFlow(
        io_shape=list(XY_SHAPE), x_d=1, squeeze_factor_block_list=list(sf),
        ResNeXt_block_list=list(nrb), num_kernels_list=list(nk),
        cardinality_list=list(card), ksize=3,
        init=tf.keras.initializers.Orthogonal(0.1), DILATIONS=True,
        LAYER_NORM=True,
    )
    p = dict(params["params"])
    refc = [l for l in m.layers_list if isinstance(l, cref.coupling_layer)]
    n_ours = sum(1 for k in p if k.startswith("couplings_"))
    assert len(refc) == n_ours, (len(refc), n_ours)
    for j, rc in enumerate(refc):
        lay = dict(p[f"couplings_{j}"])
        dil = tuple(int(d) for d in rc.which_dilations)
        lay["net_a"] = _map_subnet(
            rc.model_A, lay["net_a"], rc.cardinality, dil, has_scale=True
        )
        lay["net_b"] = _map_subnet(
            rc.model_b, lay["net_b"], rc.cardinality, dil, has_scale=False
        )
        p[f"couplings_{j}"] = lay
    return {"params": p}


def run_ours(
    epochs: int, platform: str = "cpu", seed: int = SEED,
    eps: float = None, tag: str = None, group_init: bool = False,
    resume: bool = False, ckpt_every: int = 25, ref_init: bool = False,
    shared_init: bool = False, val: bool = False,
) -> None:
    """``eps`` overrides optax.adam's epsilon (default 1e-8; TF/Keras uses
    1e-7) — a parity-gap hypothesis knob. ``tag`` names the log file
    (flagship600_ours_{tag}.jsonl) for such hypothesis legs. ``group_init``
    sets ref_compat_group_init (per-group-independent orthogonal draws for
    grouped convs — the reference's init joint distribution; parity-gap
    hypothesis knob). ``resume=True`` continues from the periodic
    checkpoint (same rationale as run_ref: a multi-hour CPU leg must not be
    a total loss on crash; the JAX leg is deterministic, so the resumed
    trajectory is bit-identical to a continuous run)."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        # f32 fidelity on the MXU: 'highest' keeps trajectories in the same
        # numeric band as the CPU/TF reference (PARITY.md transplant caveat)
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.models import (
        ConvCFlow,
        ConvFlowConfig,
    )
    from arl_conditional_normalizing_flows_tpu.train import (
        create_train_state,
        make_step_fns,
    )

    sf, nrb, nk, card = ARCH
    cfg = ConvFlowConfig(
        io_shape=XY_SHAPE, x_d=1, squeeze_factor_blocks=sf, res_blocks=nrb,
        num_kernels=nk, cardinality=card, ksize=3, layer_norm=True,
        ref_compat_group_slice=True, ref_compat_group_init=group_init,
        ref_compat_shared_init=shared_init,
    )
    model = ConvCFlow(cfg)
    tx = None
    if eps is not None:
        import optax

        tx = optax.adam(LR, eps=eps)
    def _build_state():
        st = create_train_state(
            model, jnp.zeros((1,) + XY_SHAPE), LR, seed=seed, tx=tx
        )
        if ref_init:
            st = st.replace(params=_ref_init_params(st.params, seed))
        return st

    if platform == "tpu":
        # Initialize on the HOST CPU and ship the state to the device once:
        # flagship init is hundreds of orthogonal (QR) draws, and the remote
        # axon tunnel dispatches each as its own ~0.1 s round trip (observed:
        # >15 min init on-device vs seconds on host). Same values — init is
        # seed-deterministic and platform-independent at f64/f32 QR.
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            state = _build_state()
        state = jax.device_put(state, jax.devices()[0])
    else:
        state = _build_state()
    from flax import serialization

    if platform == "tpu":
        # Periodic state readback through the remote axon tunnel costs
        # minutes per save (hundreds of leaves x ~0.1 s dispatch + ~190 MB
        # at ~32 MB/s) — worse than re-running the ~20-min leg. Checkpoints
        # are for the multi-hour CPU legs.
        ckpt_every = 0
    ck_path = _log_path("ours", seed, tag).replace(".jsonl", ".ckpt.npz")
    start_ep, elapsed0 = 0, 0.0
    if resume and os.path.exists(ck_path):
        d = np.load(ck_path)
        start_ep = int(d["epoch"])
        elapsed0 = float(d["elapsed"]) if "elapsed" in d else _logged_t(
            _log_path("ours", seed, tag), start_ep)
        _truncate_log(_log_path("ours", seed, tag), start_ep)
        state = serialization.from_bytes(state, d["state"].tobytes())
        print(f"resumed from epoch {start_ep} ({ck_path}, "
              f"{elapsed0:.0f}s elapsed)", flush=True)

    def save_ckpt(ep, st):
        raw = np.frombuffer(serialization.to_bytes(st), dtype=np.uint8)
        tmp = ck_path + ".tmp.npz"
        np.savez(tmp, epoch=np.asarray(ep),
                 elapsed=np.asarray(time.time() - t0), state=raw)
        os.replace(tmp, ck_path)

    step, eval_step = make_step_fns(model, noise_mode="none")
    vset = _val_set() if val else None
    mm = _stream(epochs)
    kdummy = jax.random.PRNGKey(0)
    one = jnp.float32(1.0)
    t0 = time.time() - elapsed0
    for ep in range(start_ep, epochs):
        vals = []
        for i in range(BATCHES_PER_EPOCH):
            state, out = step(state, jnp.asarray(mm[ep, i]), kdummy, one)
            vals.append([
                float(out[k]) for k in ("loss", "z_loss", "y_loss", "detJ_loss")
            ])
        mean = np.mean(vals, axis=0)
        row = {
            "epoch": ep + 1,
            "loss": round(float(mean[0]), 3),
            "z_loss": round(float(mean[1]), 3),
            "y_loss": round(float(mean[2]), 3),
            "detJ_loss": round(float(mean[3]), 3),
            "platform": platform,
            "t": round(time.time() - t0, 1),
        }
        if val and _is_val_epoch(ep + 1, epochs):
            vv = [
                [
                    float(o[k])
                    for k in ("loss", "z_loss", "y_loss", "detJ_loss")
                ]
                for o in (
                    eval_step(state, jnp.asarray(vset[i]))
                    for i in range(BATCHES_PER_EPOCH)
                )
            ]
            vm = np.mean(vv, axis=0)
            row.update(
                val_loss=round(float(vm[0]), 3),
                val_z_loss=round(float(vm[1]), 3),
                val_y_loss=round(float(vm[2]), 3),
                val_detJ_loss=round(float(vm[3]), 3),
            )
        _append("ours", row, seed, tag)
        if ckpt_every and ((ep + 1) % ckpt_every == 0 or ep + 1 == epochs):
            save_ckpt(ep + 1, state)
    print(f"ours({platform}) done: {epochs} epochs in {time.time() - t0:.0f}s",
          flush=True)


def merge(epochs: int) -> None:
    import glob as _glob

    def read_log(path):
        rows = {}
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                rows[r["epoch"]] = r  # last write wins on restart overlap
        return [rows[e] for e in sorted(rows)]

    def read_seeds(impl):
        """seed -> rows, for every per-seed log present (seed 0 = no suffix).
        A seed leg's WHOLE suffix is s<digits> — tag legs containing an
        incidental _s<digits> (e.g. _sharedinit_s2, _refinit_s1) are
        hypothesis legs and must not contaminate the seed band."""
        import re as _re

        out = {0: read_log(_log_path(impl))}
        for p in sorted(_glob.glob(
                os.path.join(RESULTS_DIR, f"flagship600_{impl}_s*.jsonl"))):
            m = _re.fullmatch(
                rf"flagship600_{impl}_s(\d+)\.jsonl", os.path.basename(p)
            )
            if m:
                out[int(m.group(1))] = read_log(p)
        return out

    ref_seeds, ours_seeds = read_seeds("ref"), read_seeds("ours")
    ref, ours = ref_seeds[0], ours_seeds[0]
    n = min(len(ref), len(ours))
    marks = sorted({min(e, n - 1) for e in (0, 9, 49, 99, 149, 299, 449, n - 1)})
    names = ("loss", "z_loss", "y_loss", "detJ_loss")

    def side(rows):
        losses = [r["loss"] for r in rows[:n]]
        return {
            "final": {k: rows[n - 1][k] for k in names},
            "best_loss": min(losses),
            "loss_trajectory": [round(losses[m], 2) for m in marks],
            "seconds": rows[n - 1]["t"],
        }

    def tail_stats(rows):
        """Per-leg tail summary over whatever epochs the leg completed."""
        m = len(rows)
        tail = rows[max(0, m - 20):]
        loss = [r["loss"] for r in tail]
        yl = [r["y_loss"] for r in tail]
        return {
            "epochs": m,
            "last20_mean_loss": round(float(np.mean(loss)), 1),
            "last20_std_loss": round(float(np.std(loss)), 1),
            "last20_mean_y_loss": round(float(np.mean(yl)), 1),
            "best_loss": round(min(r["loss"] for r in rows), 1),
        }

    def band(seed_map):
        legs = {f"seed{s}": tail_stats(r) for s, r in sorted(seed_map.items())}
        # a leg is "full" only at the REQUESTED budget — using the seed-0
        # minimum would let partial legs contaminate the band while a
        # seed-0 leg is still in progress
        full = [t for t in legs.values() if t["epochs"] >= epochs]
        summary = {}
        if full:
            for key in ("last20_mean_loss", "best_loss"):
                vals = [t[key] for t in full]
                summary[key] = {
                    "min": min(vals), "max": max(vals),
                    "mean": round(float(np.mean(vals)), 1),
                }
        return {"legs": legs, "n_full_legs": len(full), "band": summary}

    # hypothesis legs: every --tag log (eps sweep, cpu-numerics, ginit, ...)
    # gets its tail stats recorded so the merged json is the one complete
    # story (tags are excluded from the seed bands on purpose — they change
    # a variable other than the seed)
    hypothesis = {}
    for p in sorted(_glob.glob(
            os.path.join(RESULTS_DIR, "flagship600_ours_*.jsonl"))):
        tag = os.path.basename(p)[len("flagship600_ours_"):-len(".jsonl")]
        if tag.startswith("s") and tag[1:].isdigit():
            continue  # seed leg, already in the band
        if tag.split("_s")[0] in ("val", "valshared"):
            continue  # held-out-val leg, reported in val_bands below
        rows = read_log(p)
        if rows:
            hypothesis[tag] = dict(
                tail_stats(rows), platform=rows[0].get("platform", "cpu")
            )

    # held-out-validation legs (VERDICT r4 #1): every 10 epochs both legs
    # evaluate the byte-identical fixed held-out set (genval). Bands over
    # the val tail decide whether the shared-init train-NLL win is model
    # quality or memorization of the 128-image stream.
    def read_tag_seeds(impl, base):
        import re as _re

        out = {}
        p0 = os.path.join(RESULTS_DIR, f"flagship600_{impl}_{base}.jsonl")
        if os.path.exists(p0):
            out[0] = read_log(p0)
        for p in sorted(_glob.glob(os.path.join(
                RESULTS_DIR, f"flagship600_{impl}_{base}_s*.jsonl"))):
            m = _re.fullmatch(
                rf"flagship600_{impl}_{base}_s(\d+)\.jsonl",
                os.path.basename(p),
            )
            if m:
                out[int(m.group(1))] = read_log(p)
        return out

    def val_tail_stats(rows):
        vrows = [r for r in rows if "val_loss" in r]
        if not vrows:
            return None
        tail = vrows[-3:]  # last 3 evals => epochs ~580/590/600 on full legs
        st = tail_stats(rows)  # train-side tail for the same leg
        return {
            "epochs": len(rows),
            "val_final": vrows[-1]["val_loss"],
            "val_last3_mean": round(
                float(np.mean([r["val_loss"] for r in tail])), 1),
            "val_best": round(min(r["val_loss"] for r in vrows), 1),
            "val_final_y_loss": vrows[-1]["val_y_loss"],
            "train_last20_mean_loss": st["last20_mean_loss"],
            "train_best_loss": st["best_loss"],
        }

    def val_band(seed_map):
        legs = {}
        for s, rows in sorted(seed_map.items()):
            st = val_tail_stats(rows)
            if st:
                legs[f"seed{s}"] = st
        full = [t for t in legs.values() if t["epochs"] >= epochs]
        summary = {}
        for key in ("val_final", "val_last3_mean", "train_last20_mean_loss"):
            vals = [t[key] for t in full]
            if vals:
                summary[key] = {
                    "min": min(vals), "max": max(vals),
                    "mean": round(float(np.mean(vals)), 1),
                }
        return {"legs": legs, "n_full_legs": len(full), "band": summary}

    val_bands = {
        "reference": val_band(read_tag_seeds("ref", "val")),
        "ours_default": val_band(read_tag_seeds("ours", "val")),
        "ours_sharedinit": val_band(read_tag_seeds("ours", "valshared")),
    }

    out = {
        "task": "class-conditional 28x28 synthetic, identical batches, "
                "FLAGSHIP arch (conv_cINN.py:56-65), full 600-epoch budget",
        "epochs": n,
        "annealing_epochs": ANNEAL,
        "loss_trajectory_epochs": [m + 1 for m in marks],
        "reference": side(ref),
        "ours": side(ours),
        "ours_platform": ours[0].get("platform", "cpu"),
        "seed_bands": {"reference": band(ref_seeds), "ours": band(ours_seeds)},
        "val_bands": val_bands,
        "hypothesis_legs": hypothesis,
    }
    print(json.dumps(out, indent=2))
    path = os.path.join(RESULTS_DIR, "conv_train_parity.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing["image_flagship_600"] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)


def main():
    argv = list(sys.argv[1:])
    seed, eps, tag = SEED, None, None
    resume = "--resume" in argv
    if resume:
        argv.remove("--resume")
    ginit = "--ginit" in argv
    if ginit:
        argv.remove("--ginit")
    refinit = "--refinit" in argv
    if refinit:
        argv.remove("--refinit")
    sharedinit = "--sharedinit" in argv
    if sharedinit:
        argv.remove("--sharedinit")
    val = "--val" in argv
    if val:
        argv.remove("--val")
    for flag, cast in (("--seed", int), ("--eps", float), ("--tag", str)):
        if flag in argv:
            i = argv.index(flag)
            val = cast(argv[i + 1])
            del argv[i:i + 2]
            if flag == "--seed":
                seed = val
            elif flag == "--eps":
                eps = val
            else:
                tag = val
    cmd = argv[0]
    if cmd not in ("ours", "ref") and (eps is not None or tag is not None
                                       or ginit or refinit or sharedinit
                                       or val):
        raise SystemExit(
            "--eps/--tag/--ginit/--refinit/--sharedinit/--val are training-"
            f"leg flags; silently dropping them for '{cmd}' would "
            "contaminate the default logs"
        )
    if cmd == "ref" and (eps is not None or tag is not None or ginit
                         or refinit or sharedinit):
        raise SystemExit(
            "--eps/--tag/--ginit/--refinit/--sharedinit are 'ours'-only "
            "flags (the ref leg has no such knobs)"
        )
    if cmd == "ours" and val:
        # val legs get dedicated log names so the round-4 train-NLL seed
        # bands stay immutable; valshared separates the two init families
        # the val adjudication compares.
        if tag is not None:
            raise SystemExit("--val derives its own tag; drop --tag")
        base = "valshared" if sharedinit else "val"
        if eps is not None or ginit or refinit:
            raise SystemExit("--val supports only --sharedinit legs")
        tag = base if seed == SEED else f"{base}_s{seed}"
        print(f"val leg: auto-derived --tag {tag}", flush=True)
    elif tag is None and (eps is not None or ginit or refinit or sharedinit):
        # A hypothesis leg without --tag would resolve to the DEFAULT seed
        # log/checkpoint and contaminate the seed band (ADVICE r3 medium).
        # Auto-derive a tag from the flags so the leg always gets its own
        # flagship600_ours_{tag}.jsonl.
        base = ("refinit" if refinit else "sharedinit" if sharedinit
                else "ginit" if ginit else f"eps{eps:g}")
        tag = base if seed == SEED else f"{base}_s{seed}"
        print(f"hypothesis leg: auto-derived --tag {tag}", flush=True)
    epochs = int(argv[1]) if len(argv) > 1 else 600
    if cmd == "gen":
        gen(epochs)
    elif cmd == "genval":
        gen_val()
    elif cmd == "ref":
        run_ref(epochs, seed, resume, val=val)
    elif cmd == "ours":
        run_ours(epochs, argv[2] if len(argv) > 2 else "cpu", seed, eps, tag,
                 ginit, resume, ref_init=refinit, shared_init=sharedinit,
                 val=val)
    elif cmd == "merge":
        merge(epochs)
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()


