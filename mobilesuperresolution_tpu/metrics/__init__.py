from mobilesuperresolution_tpu.metrics.metrics import psnr, psnr_y, ssim, ssim_np
