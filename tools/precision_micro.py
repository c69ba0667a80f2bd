"""Micro-bench: dot precision strategies inside a Pallas kernel.

The axon Mosaic service changed its DEFAULT dot precision to 1-pass bf16
mid-round-3 (~1e-2 relative error — leaks/loses edge hits), and the only
other supported enum is HIGHEST (#tpu.contract_precision<fp32>), which
measured ~2x on the frame.  This micro measures, on a kernel shaped like
the production fold ((8, 6k) W^T @ (8, R) rays, contraction K=8):

  default : 1-pass bf16 (fast, wrong)
  highest : fp32 contract precision (exact, slow)
  split3  : hand-rolled bf16x3 — W and rays split into hi+lo bf16 parts,
            three default-precision passes (hi*hi + lo*hi + hi*lo)

Run on the TPU:  python -m tools.precision_micro
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128
R = 256
STEPS = 2048  # grid steps per launch; enough to dominate machinery


def _body(variant):
    def kernel(w_ref, r_ref, out_ref):
        w = w_ref[0]
        rays = r_ref[0]
        if variant == "default":
            mm = jax.lax.dot_general(
                w, rays, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "highest":
            mm = jax.lax.dot_general(
                w, rays, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:  # split3
            w_hi = (w.astype(jnp.bfloat16)).astype(jnp.float32)
            w_lo = w - w_hi
            r_hi = (rays.astype(jnp.bfloat16)).astype(jnp.float32)
            r_lo = rays - r_hi
            dims = (((0,), (0,)), ((), ()))
            mm = jax.lax.dot_general(
                w_hi, r_hi, dims, preferred_element_type=jnp.float32)
            mm = mm + jax.lax.dot_general(
                w_lo, r_hi, dims, preferred_element_type=jnp.float32)
            mm = mm + jax.lax.dot_general(
                w_hi, r_lo, dims, preferred_element_type=jnp.float32)
        # a production-shaped VPU tail so the measurement includes overlap
        opz = mm[2 * K : 3 * K]
        dpz = mm[5 * K : 6 * K]
        tt = -opz / dpz
        u = mm[0 * K : 1 * K] + tt * mm[3 * K : 4 * K]
        vv = mm[1 * K : 2 * K] + tt * mm[4 * K : 5 * K]
        q = jnp.minimum(jnp.minimum(u, vv), 1.0 - u - vv)
        ok = (q >= 0.0) & (tt > 1e-3)
        packed = jnp.where(ok, pltpu.bitcast(tt, jnp.int32), 2**31 - 2)
        out_ref[0] = jnp.minimum(out_ref[0], jnp.min(packed, axis=0,
                                                     keepdims=True))
    return kernel


def launch(variant, w, rays):
    grid_spec = pl.GridSpec(
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, 8, 6 * K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, R), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, R), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    (out,) = pl.pallas_call(
        _body(variant),
        out_shape=[jax.ShapeDtypeStruct((1, 1, R), jnp.int32)],
        grid_spec=grid_spec,
    )(w, rays)
    return out


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((STEPS, 8, 6 * K)), jnp.float32)
    rays = jnp.asarray(rng.standard_normal((1, 8, R)), jnp.float32)

    # numeric reference on host
    wh = np.asarray(w)
    rh = np.asarray(rays)
    ref = np.einsum("skc,skr->scr", wh.reshape(STEPS, 8, 6 * K),
                    rh.repeat(STEPS, 0))

    for variant in ("default", "highest", "split3"):
        fn = jax.jit(lambda w, r, v=variant: launch(v, w, r))
        out = fn(w, rays)
        jax.block_until_ready(out)
        # timing: loop inside one jit to hide the tunnel

        @jax.jit
        def loop(w, r, v=variant):
            def body(i, acc):
                o = launch(v, w, r)
                return acc + o[0, 0, 0]
            return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

        x = loop(w, rays); jax.block_until_ready(x)
        t0 = time.perf_counter()
        x = loop(w, rays); jax.block_until_ready(x)
        float(x)
        dt = (time.perf_counter() - t0) / 10

        # error probe: single-step eval of mm via a 1-step launch variant
        print(f"{variant:8s}: {dt*1e3:7.2f} ms / {STEPS} steps "
              f"({dt/STEPS*1e6:6.2f} us/step)", flush=True)


if __name__ == "__main__":
    main()
