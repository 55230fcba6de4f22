"""Sort-cost matrix on the current backend.

Grounds the binning/reorder design decisions (BASELINE.md speed-of-light
memo): measures `jax.lax.sort` wall time vs element count, key layout
(single int key vs 2-key lexicographic) and payload operand count, plus
the two alternatives the pipeline can switch to — row-gather
reconstruction and XLA scatter.  One JSON line per config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gscream_tpu.precision import enable_compile_cache
    enable_compile_cache()
    rng = np.random.default_rng(0)
    for n in (1 << 20, 3 << 19, 1 << 21):
        key1 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        key2 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        f32s = [jnp.asarray(rng.normal(size=n), jnp.float32)
                for _ in range(11)]
        rows = jnp.stack(f32s + f32s[:5], axis=1)      # (n,16)

        for npay in (0, 2, 5, 11):
            ops = (key1,) + tuple(f32s[:npay])
            dt = timeit(jax.jit(lambda *o: jax.lax.sort(
                o, num_keys=1, is_stable=True)), *ops)
            print(json.dumps({"n": n, "kind": "1key", "payload": npay,
                              "ms": dt * 1e3}))
            ops2 = (key1, key2) + tuple(f32s[:npay])
            dt = timeit(jax.jit(lambda *o: jax.lax.sort(
                o, num_keys=2, is_stable=True)), *ops2)
            print(json.dumps({"n": n, "kind": "2key", "payload": npay,
                              "ms": dt * 1e3}))

        # permutation application alternatives (the backward reorder)
        dt = timeit(jax.jit(lambda p, r: r[p]), perm, rows)
        print(json.dumps({"n": n, "kind": "row_gather16", "ms": dt * 1e3}))
        dt = timeit(jax.jit(
            lambda p, r: jnp.zeros_like(r).at[p].set(r)), perm, rows)
        print(json.dumps({"n": n, "kind": "row_scatter16", "ms": dt * 1e3}))
        dt = timeit(jax.jit(lambda p, *c: jax.lax.sort(
            (p,) + c, num_keys=1, is_stable=True)), perm, *f32s)
        print(json.dumps({"n": n, "kind": "perm_sort11", "ms": dt * 1e3}))


if __name__ == "__main__":
    main()
