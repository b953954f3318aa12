from dynavsr_tpu.eval.metrics import calculate_psnr, calculate_ssim
from dynavsr_tpu.eval.convert_img import tensor2img
