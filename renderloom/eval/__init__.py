"""Evaluation loops and metrics (motion MSE/MAE/MAX, renderer PSNR/SSIM)."""
