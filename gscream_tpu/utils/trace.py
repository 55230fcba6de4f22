"""XLA/TPU profiler trace capture behind ``GSCREAM_TRACE=<dir>``.

SURVEY.md §5 names ``jax.profiler`` traces as the TPU equivalent of the
reference's wall-clock-only instrumentation (``torch.cuda.Event`` pairs,
reference train.py:343-344,406,578).  Every bench/profile entry point
wraps its timed region in :func:`maybe_trace`; when the env var is unset
this is a zero-cost no-op, when set it writes a TensorBoard-loadable
trace (``.../plugins/profile/...``) so per-kernel/per-fusion attribution
no longer relies on wall-clock subtraction (VERDICT r3 item 7).

Usage::

    with maybe_trace("bench_fwd_bwd"):
        for _ in range(iters):
            out = grad_fn(*args)
        jax.block_until_ready(out)

    GSCREAM_TRACE=/tmp/trace python bench.py
"""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace(label: str):
    """Capture a ``jax.profiler`` trace of the enclosed block into
    ``$GSCREAM_TRACE/<label>`` (no-op when the env var is unset)."""
    base = os.environ.get("GSCREAM_TRACE")
    if not base:
        yield
        return
    import jax

    out = os.path.join(base, label)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield
    print(f"# trace written: {out} (TensorBoard 'profile' plugin / "
          f"xprof)")
