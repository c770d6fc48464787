"""Probe: does Pallas TPU accept a TRACED grid dimension (dynamic grid)?

Needed for the live-block-bound rasterizer grid (VERDICT r3 item 1a).
Runs a tiny copy kernel with grid = f(traced scalar) under jit on the
real TPU, twice with different live counts, and checks only the live
prefix was written.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def run(live_blocks, x):
    grid = (live_blocks,)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(x)


def main():
    import numpy as np

    x = jnp.ones((64, 128), jnp.float32)
    f = jax.jit(run)
    try:
        out = f(jnp.int32(3), x)
        out2 = f(jnp.int32(8), x)
        a = np.asarray(out)
        b = np.asarray(out2)
        print("dynamic grid: COMPILED AND RAN")
        print("live=3: rows0-23 written:", bool((a[:24] == 2.0).all()))
        print("live=8: all written:", bool((b == 2.0).all()))
    except Exception as e:  # noqa: BLE001
        print("dynamic grid FAILED:", type(e).__name__, str(e)[:500])


if __name__ == "__main__":
    main()
