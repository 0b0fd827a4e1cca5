from qdm_tpu.evaluation.kl_divergence import (  # noqa: F401
    eval_kl_divergence, evaluate_perplexity, kl_and_topk, bin_conf)
from qdm_tpu.evaluation.lpips import (  # noqa: F401
    lpips_distance, load_lpips_weights, random_lpips_weights, mse, psnr, ssim)
from qdm_tpu.evaluation.eval_utils import (  # noqa: F401
    eval_mmlu, make_mmlu_table, eval_librispeech, word_error_rate,
    format_mmlu_prompt, MMLU_CATEGORIES)
from qdm_tpu.evaluation.humaneval import (  # noqa: F401
    eval_humaneval, check_correctness, estimate_pass_at_k)
from qdm_tpu.evaluation.pipeline_eval import eval_quantized_pipeline  # noqa: F401
from qdm_tpu.evaluation.captioning import (  # noqa: F401
    cider_d, vqa_accuracy, normalize_answer)
