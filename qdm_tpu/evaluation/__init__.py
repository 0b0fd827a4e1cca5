from qdm_tpu.evaluation.kl_divergence import (  # noqa: F401
    eval_kl_divergence, evaluate_perplexity, kl_and_topk, bin_conf)
from qdm_tpu.evaluation.lpips import (  # noqa: F401
    lpips_distance, load_lpips_weights, random_lpips_weights, mse, psnr, ssim)
