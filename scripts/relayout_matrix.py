"""A/B matrix of capacity-scale data-movement primitives on the TPU.

Round-4 question (BASELINE.md speed-of-light memo): the two binning-adjacent
stages (emission build ~27 ms, pack ~16 ms) and the backward reorder are
dominated not by ``lax.sort`` (measured ~0.1 ms) but by the *relayouts and
gathers around it*.  This script times every candidate primitive for moving
(capacity, k) attribute data so the pipeline can be rebuilt from the fast
ones:

  stack1      jnp.stack(k cols, axis=1)          — the lane interleave used
                                                    by pack/emission today
  stack0      jnp.stack(k cols, axis=0)          — layout-preserving copies
  stack0+T    stack(axis=0) then jnp.transpose   — XLA transpose instead of
                                                    the interleave
  transposeT  (k, cap) -> (cap, k) alone
  rowgather   A[idx] with A (N, k), idx (cap,)   — the emission-build gather
  rowgatherC  A[idx] with A (cap, k), idx a random permutation (the reorder)
  colgather   k separate (cap,)-vector gathers   — the "scalar gather" path
  sortP       lax.sort 1 int key + k f32 payload — data movement via sort
  dus-cols    (cap, k) built by k dynamic_update_slice column writes
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=20, label=""):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.3f} ms")
    return out


def main():
    cap = 1 << 20          # ~1M instances (the r3 fitted tier is 1.31M)
    n = 300_000            # gaussian-table scale
    rng = np.random.default_rng(0)
    for k in (8, 16):
        print(f"--- cap={cap}  k={k} ---")
        cols = [jnp.asarray(rng.normal(size=cap).astype(np.float32))
                for _ in range(k)]
        mat = jnp.stack(cols, axis=0)                  # (k, cap)
        matc = jnp.asarray(
            rng.normal(size=(cap, k)).astype(np.float32))
        tab = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
        idx_mono = jnp.asarray(np.sort(
            rng.integers(0, n, size=cap)).astype(np.int32))
        perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
        key = jnp.asarray(rng.integers(0, 1 << 30, size=cap,
                                       dtype=np.int32))

        timeit(jax.jit(lambda *c: jnp.stack(c, axis=1)), *cols,
               label="stack1 (lane interleave)")
        timeit(jax.jit(lambda *c: jnp.stack(c, axis=0)), *cols,
               label="stack0")
        timeit(jax.jit(lambda *c: jnp.stack(c, axis=0).T), *cols,
               label="stack0 + transpose")
        timeit(jax.jit(lambda m: m.T.copy()), mat,
               label="transpose (k,cap)->(cap,k)")
        timeit(jax.jit(lambda m: m.T.copy()), matc,
               label="transpose (cap,k)->(k,cap)")
        timeit(jax.jit(lambda t, i: t[i]), tab, idx_mono,
               label="rowgather (N,k) monotone idx")
        timeit(jax.jit(lambda t, i: t[i]), matc, perm,
               label="rowgatherC (cap,k) permutation")
        timeit(jax.jit(lambda c, i: c[i]), cols[0], perm,
               label="colgather 1 vector")
        timeit(jax.jit(
            lambda ky, *c: jax.lax.sort((ky,) + c, num_keys=1,
                                        is_stable=True)[1]),
            key, *cols, label=f"sortP int key + {k} f32 payload")
        timeit(jax.jit(
            lambda ky, m: jax.lax.sort(
                (ky,) + tuple(m[i] for i in range(k)), num_keys=1,
                is_stable=True)[1]),
            key, mat, label="sortP from (k,cap) row slices")

        def dus(*c):
            out = jnp.zeros((cap, k), jnp.float32)
            for i, ci in enumerate(c):
                out = jax.lax.dynamic_update_slice(
                    out, ci[:, None], (0, i))
            return out
        timeit(jax.jit(dus), *cols, label="dus-cols")

        # reshape pack path: (cap, 16) -> (cap//8, 128) should be free
        if k == 16:
            timeit(jax.jit(lambda m: m.reshape(cap // 8, 128).copy()),
                   matc, label="reshape (cap,16)->(cap/8,128)")
            timeit(jax.jit(
                lambda m: m.T.reshape(cap // 8, 128).copy()), mat,
                label="transpose+reshape (16,cap)->(cap/8,128)")


if __name__ == "__main__":
    main()
