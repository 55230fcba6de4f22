"""Evaluation metrics: PSNR, SSIM, LPIPS (full + masked variants)."""
