from pfnl_tpu.eval.metrics import psnr_from_mse, psnr_y_matlab, compute_ssim, avg_psnr

__all__ = ["psnr_from_mse", "psnr_y_matlab", "compute_ssim", "avg_psnr"]
