"""Compute ops: projection, rasterization, KNN, SSIM, losses, attention."""
