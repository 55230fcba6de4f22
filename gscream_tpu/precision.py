"""Numerical-precision policy.

TPU matmuls default to bf16 inputs; for this workload that is not a
quality knob but a correctness cliff: with default precision the
Scaffold-GS training loop collapses within ~50 iterations (opacities die
scene-wide), while ``highest`` (fp32-accurate multi-pass) matches CPU
training exactly — verified on hardware (see BASELINE.md).  The Pallas
kernels already pin their matmuls to HIGHEST internally; this helper pins
the surrounding graph (MLP decode, EWA covariance einsums, SSIM convs).

A selective bf16 fast path (keeping the sensitive preprocess/decode in
fp32) is future work; until then every training/benchmark entry point
calls :func:`ensure_fp32_matmuls`.
"""
from __future__ import annotations


def ensure_fp32_matmuls() -> None:
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")


def enable_compile_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Persistent XLA compile cache (remote TPU compiles cost minutes)."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
