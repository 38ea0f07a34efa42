from .metrics import psnr_img, ssim_img, ms_ssim_img, abs_error, acc_threshold, lpips_fn

__all__ = [
    "psnr_img",
    "ssim_img",
    "ms_ssim_img",
    "abs_error",
    "acc_threshold",
    "lpips_fn",
]
