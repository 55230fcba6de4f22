"""Training: state, jitted step, loop, eval/render harnesses."""
