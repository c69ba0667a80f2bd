"""Microbenchmark TPU row-gather cost models for the hit-record fetch.

python -m tools.gather_micro   (on the TPU)

Answers: is packed_a[idx] row-count-bound or byte-bound?  Do sorted /
narrow-range indices help?  Informs the hit_record redesign (59 ms/frame
at 2M rays as of r2).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2_073_600  # 1080p rays
T = 100_000    # table rows


def timed(fn, n=5, label=""):
    @jax.jit
    def run(eps):
        def body(i, carry):
            e, acc = carry
            out = fn(e)
            v = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (eps, jnp.float32(0)))
        return acc
    float(run(jnp.float32(0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:46s} {dt*1e3:9.2f} ms   {N/dt/1e6:8.1f} Mrows/s", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    idx_rand = jax.random.randint(key, (N,), 0, T, jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # tile-local: rays within a 768-tile hit rows within one 512-row window
    base = jax.random.randint(key, (N // 768,), 0, T - 512, jnp.int32)
    idx_local = (jnp.repeat(base, 768)
                 + jax.random.randint(key, (N,), 0, 512, jnp.int32))

    for w in (1, 4, 8, 16, 32, 40, 48, 64):
        tbl = jnp.arange(T * w, dtype=jnp.float32).reshape(T, w)
        timed(lambda e, tbl=tbl: tbl[jnp.minimum(idx_rand + e.astype(jnp.int32), T - 1)],
              label=f"random idx, width {w}")
    tbl = jnp.arange(T * 16, dtype=jnp.float32).reshape(T, 16)
    timed(lambda e, tbl=tbl: tbl[jnp.minimum(idx_sorted + e.astype(jnp.int32), T - 1)],
          label="sorted idx, width 16")
    timed(lambda e, tbl=tbl: tbl[jnp.minimum(idx_local + e.astype(jnp.int32), T - 1)],
          label="tile-local idx, width 16")
    # one-hot matmul alternative, per 768-ray tile over a 512-row window
    tblw = jnp.arange(512 * 16, dtype=jnp.float32).reshape(512, 16)

    def onehot_tile(e):
        li = (idx_local - jnp.repeat(base, 768)).reshape(-1, 768)  # (tiles, 768)

        def one(args):
            li_t = args
            s = (li_t[:, None] == jnp.arange(512)[None, :]).astype(jnp.float32)
            return s @ tblw  # (768, 16)
        out = jax.lax.map(one, li + e.astype(jnp.int32) * 0)
        return out

    timed(onehot_tile, label="one-hot matmul (512-row windows)")


if __name__ == "__main__":
    main()
