"""Mosaic lowering probes for the fused-subnet kernel design.

Answers, on the REAL TPU (or CPU interpret mode with --cpu):

1. Can a kernel read a strided 4D slice of a padded VMEM scratch and feed it
   straight to ``dot_general`` (tap-matmul conv) — and how fast is it?
2. Does Mosaic accept a BATCHED dot_general (grouped conv as (G,M,g)x(G,g,g))?
3. How fast is one dilated-res-block conv chain as a single Pallas kernel vs
   the same chain in plain XLA (the current flax lowering)?

Timing uses the repo's honest methodology: lax.scan over N inner iterations
with a scalar probe readback (bench.py docstring; block_until_ready lies on
the axon backend).
"""

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INNER = int(__import__("os").environ.get("PROBE_INNER", 256))


def timed(fn, x, *args, inner=None, iters=3):
    """Median seconds per call of fn(x, *args) amortized over `inner` scanned
    applications with a forced host readback.

    The first argument is threaded through the scan (each iteration's input
    depends on the previous output) so XLA cannot hoist the body as
    loop-invariant; the final readback forces completion (block_until_ready
    is unreliable on the axon backend — bench.py docstring).
    """
    inner = inner or INNER

    def multi(x, *a):
        def body(c, _):
            x, acc = c
            out = fn(x, *a)
            probe = jnp.sum(out).astype(jnp.float32)
            x = x + (probe * 1e-30).astype(x.dtype)
            return (x, acc + probe * 1e-20), None

        (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None,
                                    length=inner)
        return acc + jnp.sum(xf).astype(jnp.float32) * 1e-20

    multi = jax.jit(multi)
    probe = float(multi(x, *args))  # compile + first run
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        probe = float(multi(x, *args))
        times.append(time.perf_counter() - t0)
    del probe
    return sorted(times)[len(times) // 2] / inner


# ---------------------------------------------------------------------------
# Probe 1: 3x3 conv via 9 tap dot_generals on 4D padded scratch
# ---------------------------------------------------------------------------

def conv_tap_kernel(x_ref, w_ref, o_ref, pad_ref, *, H, W, Cin, Cout, ksize, dil):
    """x (T,H,W,Cin) -> o (T,H,W,Cout) = conv3x3(dil) via tap matmuls."""
    T = x_ref.shape[0]
    P = dil * (ksize - 1) // 2
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[:, P : P + H, P : P + W, :] = x_ref[:]
    acc = jnp.zeros((T, H, W, Cout), jnp.float32)
    for ty in range(ksize):
        for tx in range(ksize):
            xs = pad_ref[:, ty * dil : ty * dil + H, tx * dil : tx * dil + W, :]
            acc = acc + jax.lax.dot_general(
                xs,
                w_ref[ty, tx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = acc


def probe_tap_conv(B=128, H=28, W=28, Cin=64, Cout=64, ksize=3, dil=1, T=8,
                   dtype=jnp.bfloat16, interpret=False):
    P = dil * (ksize - 1) // 2
    kern = functools.partial(
        conv_tap_kernel, H=H, W=W, Cin=Cin, Cout=Cout, ksize=ksize, dil=dil
    )
    fn = pl.pallas_call(
        kern,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize, ksize, Cin, Cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, H + 2 * P, W + 2 * P, Cin), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), dtype)
    w = jnp.asarray(rng.normal(size=(ksize, ksize, Cin, Cout)) * 0.1, dtype)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    out = fn(x, w)
    expect = jax.jit(ref)(x, w)
    err = float(jnp.max(jnp.abs(out - expect)))
    scale = float(jnp.max(jnp.abs(expect))) + 1e-9
    ok = err / scale < 2e-2
    t_pallas = timed(fn, x, w)
    t_xla = timed(ref, x, w)
    return {"ok": ok, "rel_err": err / scale, "pallas_us": t_pallas * 1e6,
            "xla_us": t_xla * 1e6}


# ---------------------------------------------------------------------------
# Probe 2: batched (grouped) dot_general
# ---------------------------------------------------------------------------

def grouped_dot_kernel(x_ref, w_ref, o_ref):
    """x (G, M, g) @ w (G, g, g) -> o (G, M, g), batched over G."""
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def probe_grouped_dot(G=8, M=6272, g=8, dtype=jnp.bfloat16, interpret=False):
    fn = pl.pallas_call(
        grouped_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((G, M, g), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(G, M, g)), dtype)
    w = jnp.asarray(rng.normal(size=(G, g, g)) * 0.1, dtype)
    try:
        out = fn(x, w)
        expect = jnp.einsum("gmi,gio->gmo", x.astype(jnp.float32),
                            w.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(out - expect)))
        scale = float(jnp.max(jnp.abs(expect))) + 1e-9
        t = timed(fn, x, w)
        return {"ok": err / scale < 2e-2, "rel_err": err / scale, "us": t * 1e6}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e)[:300]}


# ---------------------------------------------------------------------------
# Probe 3: lane-sliced matmul (branch input slice [:, :w] of a wider buffer)
# ---------------------------------------------------------------------------

def lane_slice_kernel(x_ref, w_ref, o_ref, *, win):
    xs = x_ref[:, :win]
    o_ref[:] = jax.lax.dot_general(
        xs, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def probe_lane_slice(M=6272, C=64, win=32, Cout=32, dtype=jnp.bfloat16,
                     interpret=False):
    fn = pl.pallas_call(
        functools.partial(lane_slice_kernel, win=win),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)), dtype)
    w = jnp.asarray(rng.normal(size=(win, Cout)) * 0.1, dtype)
    try:
        out = fn(x, w)
        expect = x[:, :win].astype(jnp.float32) @ w.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out - expect)))
        scale = float(jnp.max(jnp.abs(expect))) + 1e-9
        t = timed(fn, x, w)
        return {"ok": err / scale < 2e-2, "rel_err": err / scale, "us": t * 1e6}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e)[:300]}


# ---------------------------------------------------------------------------
# Probe 4: one full dilated-res-block chain, value-based (jnp.pad + slices),
# vs the identical chain in plain XLA — the realistic end-to-end predictor.
# ---------------------------------------------------------------------------

def _chain_maths(jnp_pad):
    """Shared math for probe 4 (so Pallas and XLA run identical code)."""

    def conv_taps(x, w, dil, ksize):
        P = dil * (ksize - 1) // 2
        xp = jnp_pad(x, P)
        H, W = x.shape[1], x.shape[2]
        acc = None
        for ty in range(ksize):
            for tx in range(ksize):
                xs = jax.lax.slice(
                    xp,
                    (0, ty * dil, tx * dil, 0),
                    (xp.shape[0], ty * dil + H, tx * dil + W, xp.shape[3]),
                )
                d = jax.lax.dot_general(
                    xs, w[ty, tx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        return acc

    return conv_taps


def probe_resblock_chain(B=128, H=28, W=28, K=64, card=8, dils=(1, 2, 4),
                         T=4, dtype=jnp.bfloat16, interpret=False):
    """lrelu -> 1x1 -> lrelu -> dilated grouped branches (dense-expanded
    block-diagonal kernels) -> lrelu -> 1x1 -> +sc."""
    ksize = 3
    rng = np.random.default_rng(0)
    widths = [K // d for d in dils]

    w1 = jnp.asarray(rng.normal(size=(K, K)) * 0.1, dtype)
    # grouped branch kernels, dense-expanded (k,k,K,w) with block-diag groups
    wbs = []
    for d, w_ in zip(dils, widths):
        g = w_ // card
        dense = np.zeros((ksize, ksize, K, w_), np.float32)
        for grp in range(card):
            dense[:, :, grp * g : (grp + 1) * g, grp * g : (grp + 1) * g] = (
                rng.normal(size=(ksize, ksize, g, g)) * 0.1
            )
        wbs.append(jnp.asarray(dense, dtype))
    wposts = [jnp.asarray(rng.normal(size=(w_, K)) * 0.1, dtype) for w_ in widths]
    x = jnp.asarray(rng.normal(size=(B, H, W, K)), dtype)

    def lrelu(v):
        return jnp.where(v > 0, v, 0.3 * v)

    def chain(x, w1, wbs, wposts, pad_fn):
        conv_taps = _chain_maths(pad_fn)
        t = lrelu(x.astype(jnp.float32))
        t = jax.lax.dot_general(
            t.astype(dtype), w1,
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = lrelu(t).astype(dtype)
        u = None
        for d, wb, wp in zip(dils, wbs, wposts):
            s = conv_taps(t, wb, d, ksize)
            s = lrelu(s).astype(dtype)
            c = jax.lax.dot_general(
                s, wp,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = c if u is None else u + c
        return x.astype(jnp.float32) + u

    def pad_val(v, P):
        return jnp.pad(v, ((0, 0), (P, P), (P, P), (0, 0)))

    def kernel(x_ref, w1_ref, *rest):
        wb_refs = rest[: len(dils)]
        wp_refs = rest[len(dils) : 2 * len(dils)]
        o_ref = rest[2 * len(dils)]
        o_ref[:] = chain(
            x_ref[:], w1_ref[:], [r[:] for r in wb_refs],
            [r[:] for r in wp_refs], pad_val,
        )

    fn = pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, H, W, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n,
                        memory_space=pltpu.VMEM) for w in [w1] + wbs + wposts],
        out_specs=pl.BlockSpec((T, H, W, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    def pallas_fn(x):
        return fn(x, w1, *wbs, *wposts)

    def xla_fn(x):
        return chain(x, w1, wbs, wposts, pad_val)

    def xla_conv_fn(x):
        # the current production lowering: real grouped convs
        t = lrelu(x.astype(jnp.float32)).astype(dtype)
        t = jax.lax.dot_general(
            t, w1, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = lrelu(t).astype(dtype)
        u = None
        for d, wb, wp, w_ in zip(dils, wbs, wposts, widths):
            s = jax.lax.conv_general_dilated(
                t, wb, (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            s = lrelu(s).astype(dtype)
            c = jax.lax.dot_general(
                s, wp, dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = c if u is None else u + c
        return x.astype(jnp.float32) + u

    try:
        out = pallas_fn(x)
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e)[:500]}
    expect = jax.jit(xla_fn)(x)
    err = float(jnp.max(jnp.abs(out - expect)))
    scale = float(jnp.max(jnp.abs(expect))) + 1e-9
    t_pallas = timed(pallas_fn, x)
    t_xla = timed(jax.jit(xla_fn), x)
    t_xla_conv = timed(jax.jit(xla_conv_fn), x)
    return {
        "ok": err / scale < 2e-2, "rel_err": err / scale,
        "pallas_us": t_pallas * 1e6, "xla_same_math_us": t_xla * 1e6,
        "xla_grouped_conv_us": t_xla_conv * 1e6,
    }


# ---------------------------------------------------------------------------
# Probe 5: padded-2D row-offset conv — activations live as (Mp, C) matrices
# with spatial padding flattened into rows; each tap is a row-offset slice
# feeding ONE clean (M, C) x (C, Co) matmul. No 4D relayouts inside the loop.
# ---------------------------------------------------------------------------

def probe_padded2d_conv(B=128, H=28, W=28, Cin=64, Cout=64, ksize=3, dil=1,
                        T=8, dtype=jnp.bfloat16, interpret=False):
    P = dil * (ksize - 1) // 2
    Hp, Wp = H + 2 * P, W + 2 * P
    Mp = T * Hp * Wp
    c = (ksize - 1) // 2
    maxoff = P * Wp + P

    def kernel(x_ref, w_ref, o_ref, pad_ref):
        # embed input into padded layout (one relayout), zero borders
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, P : P + H, P : P + W, :] = x_ref[:].astype(dtype)
        x2 = pad_ref[:].reshape(Mp, Cin)  # one relayout copy
        acc = jnp.zeros((Mp - 2 * maxoff, Cout), jnp.float32)
        for ty in range(ksize):
            for tx in range(ksize):
                off = ((ty - c) * Wp + (tx - c)) * dil + maxoff
                xs = jax.lax.slice(x2, (off, 0), (off + Mp - 2 * maxoff, Cin))
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[ty, tx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        # write interior rows back to (T,H,W,Cout); acc covers padded rows
        # [maxoff, Mp-maxoff) -> pad row index r_abs = r + maxoff
        full = jnp.concatenate(
            [jnp.zeros((maxoff, Cout), jnp.float32), acc,
             jnp.zeros((maxoff, Cout), jnp.float32)], axis=0
        ).reshape(T, Hp, Wp, Cout)
        o_ref[:] = full[:, P : P + H, P : P + W, :]

    fn = pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize, ksize, Cin, Cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, Hp, Wp, Cin), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), dtype)
    w = jnp.asarray(rng.normal(size=(ksize, ksize, Cin, Cout)) * 0.1, dtype)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    try:
        out = fn(x, w)
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e)[:400]}
    expect = jax.jit(ref)(x, w)
    err = float(jnp.max(jnp.abs(out - expect)))
    scale = float(jnp.max(jnp.abs(expect))) + 1e-9
    t_pallas = timed(fn, x, w)
    t_xla = timed(ref, x, w)
    return {"ok": err / scale < 2e-2, "rel_err": err / scale,
            "pallas_us": t_pallas * 1e6, "xla_us": t_xla * 1e6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="interpret mode on CPU")
    ap.add_argument("which", nargs="*", default=["tap", "group", "slice"])
    args = ap.parse_args()
    interpret = args.cpu
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0], file=sys.stderr)

    if "tap" in args.which:
        for dil in (1, 2, 4):
            r = probe_tap_conv(dil=dil, interpret=interpret)
            print(f"tap conv dil={dil}: {r}")
    if "group" in args.which:
        print("grouped dot:", probe_grouped_dot(interpret=interpret))
    if "slice" in args.which:
        print("lane slice:", probe_lane_slice(interpret=interpret))
    if "chain" in args.which:
        print("resblock chain:", probe_resblock_chain(interpret=interpret))
    if "pad2d" in args.which:
        for dil in (1, 2, 4):
            print(f"padded-2d conv dil={dil}:",
                  probe_padded2d_conv(dil=dil, interpret=interpret))


if __name__ == "__main__":
    main()
