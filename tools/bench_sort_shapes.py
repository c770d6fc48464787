"""Probe: what does lax.sort charge for keys / payloads / stability / length?

Round-5 question (VERDICT item 1): the (tile, depth) 12-column fragment
sort is ~35 ms and the backward gid 10-column sort ~25-30 ms. Before
building any replacement, price the axes we can actually change:

  - dropping the depth key (depth-presorted expansion -> 1-key stable)
  - stability (does XLA add a hidden iota tiebreak for stable sorts?)
  - payload column count (marginal cost per carried column)
  - sorted length (tightening the padded backward capacity)

Methodology per CLAUDE.md: every output is consumed (strided-slice sums
-> one scalar) so XLA's sort simplifier cannot drop payload operands
(round-4 finding #3); K calls enqueued, one device-to-host scalar sync.
"""

import time

import numpy as np

F_FWD = 3_276_800       # bench headline fragment capacity
F_BWD = 4_321_280       # current backward padded capacity
F_BWD_TIGHT = 3_932_160  # tightened padded capacity candidate
N = 1_000_000


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def data(f, n_pay):
        tile = jnp.asarray(rng.integers(0, 8161, f), jnp.int32)
        depth = jnp.asarray(rng.random(f), jnp.float32)
        pays = [jnp.asarray(rng.random(f), jnp.float32)
                for _ in range(n_pay)]
        return tile, depth, pays

    def consume(outs):
        # Strided-slice sum per output: forces every operand live, costs ~0.
        return sum(jnp.sum(o[:: 4096].astype(jnp.float32)) for o in outs)

    def run(label, fn, args, iters=10):
        out = fn(*args)          # compile + warmup
        out = fn(*args)
        float(np.asarray(out))   # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    import functools

    def sort_fn(num_keys, stable):
        @jax.jit
        def f(*cols):
            return consume(
                jax.lax.sort(cols, num_keys=num_keys, is_stable=stable)
            )
        return f

    tile, depth, pays = data(F_FWD, 10)

    run("A fwd: stable 2key(i32,f32)+10pay @3.28M",
        sort_fn(2, True), (tile, depth, *pays))
    run("B fwd: stable 1key+10pay @3.28M",
        sort_fn(1, True), (tile, *pays))
    run("C fwd: unstable 1key+10pay @3.28M",
        sort_fn(1, False), (tile, *pays))
    run("D fwd: stable 1key+4pay @3.28M",
        sort_fn(1, True), (tile, *pays[:4]))
    run("E fwd: stable 1key+1pay @3.28M",
        sort_fn(1, True), (tile, pays[0]))

    gid_b, _, pays_b = data(F_BWD, 9)
    run("F bwd: unstable 1key+9pay @4.32M",
        sort_fn(1, False), (gid_b, *pays_b))
    gid_t, _, pays_t = data(F_BWD_TIGHT, 9)
    run("G bwd: unstable 1key+9pay @3.93M",
        sort_fn(1, False), (gid_t, *pays_t))

    # N-scale compaction sort: marginal cost of adding depth as 2nd key
    # (the depth-presort fold) on the 26-column table sort.
    flagn = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
    depthn = jnp.asarray(rng.random(N), jnp.float32)
    paysn = [jnp.asarray(rng.random(N), jnp.float32) for _ in range(24)]
    run("H tab: stable 1key+25pay @1M (current)",
        sort_fn(1, True), (flagn, depthn, *paysn))
    run("I tab: stable 2key(i32,f32)+24pay @1M",
        sort_fn(2, True), (flagn, depthn, *paysn))


if __name__ == "__main__":
    main()
