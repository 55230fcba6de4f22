"""AOT-compile the round-4 Pallas kernels at bench-tier shapes.

Mosaic layout/lane rules only surface at XLA compile (r4 found the
sub-128 lane-DMA rule this way, BASELINE.md).  This compiles — without
executing — the shuffle kernels, the column-major segment reducer, and
both emission expansion kernels, plus the full pallas-emission fwd+bwd
graph, so a rule violation fails fast instead of mid-bench.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gscream_tpu.precision import enable_compile_cache, ensure_fp32_matmuls


def main():
    enable_compile_cache()
    ensure_fp32_matmuls()
    assert jax.default_backend() == "tpu", jax.default_backend()
    cap = 1 << 20

    from gscream_tpu.ops.shuffle import pack_columns, unpack_columns
    cols = jax.ShapeDtypeStruct((16, cap + 1024), jnp.float32)
    jax.jit(pack_columns).lower(cols).compile()
    print("pack_columns: compile ok")
    packed = jax.ShapeDtypeStruct(((cap + 1024) // 8, 128), jnp.float32)
    jax.jit(unpack_columns).lower(packed).compile()
    print("unpack_columns: compile ok")

    from gscream_tpu.ops.rasterize_tiled import segment_reduce_cm
    ge = jax.ShapeDtypeStruct((16, cap), jnp.float32)
    offs = jax.ShapeDtypeStruct((300001,), jnp.int32)
    jax.jit(lambda g, o: segment_reduce_cm(g, o, 300000, False)).lower(
        ge, offs).compile()
    print("segment_reduce_cm: compile ok")

    # full emission pipeline + fwd/bwd at bench shapes (compile only)
    from bench import _bench_scene, _build_workload
    w, h = 1297, 840
    cfg, scaffold, cam = _bench_scene(w, h, 30000, 10, 0)
    os.environ["GSCREAM_EMIT"] = "pallas"
    os.environ["GSCREAM_REORDER"] = "cm"
    grad_fn, args = _build_workload(cfg, scaffold, cam, w, h, cap)
    grad_fn.lower(*args).compile()
    print("pallas-emission fwd+bwd graph: compile ok")


if __name__ == "__main__":
    main()
