from qdm_tpu.quant.rtn import (  # noqa: F401
    quantize_weight_absmax,
    quantize_weight_per_channel_absmax,
    quantize_weight_per_tensor_absmax,
    quantize_activation_per_token_absmax,
    quantize_activation_per_tensor_absmax,
    quantize_activation_per_channel_absmax,
    quantize_activation_per_channel_group_absmax,
    resolve_group_size,
)
from qdm_tpu.quant.pseudo import (  # noqa: F401
    QTensor,
    pseudo_quantize_tensor,
    quantize_tensor,
    dequantize_tensor,
)
from qdm_tpu.quant.packing import (  # noqa: F401
    pack_rows,
    unpack_rows,
    unpack_awq_layout,
    reverse_awq_order,
    dequantize_gemm,
    awq_to_canonical,
)
from qdm_tpu.quant.plan import (  # noqa: F401
    LayerQuantSpec, QuantPlan, NO_QUANT, spec_from_config)
from qdm_tpu.quant.apply import (  # noqa: F401
    fake_quantize_params, pack_params, fuse_qkv_params, unfuse_qkv_params,
    fill_static_act_scales, iter_layers, quantized_param_count)
from qdm_tpu.quant.smooth import ScalingGroup, smooth_params  # noqa: F401
from qdm_tpu.quant.awq import awq_search_and_apply, search_best_scale, compute_best_clip  # noqa: F401
from qdm_tpu.quant.codebook import codebook_quantize, codebook_quantize_weight, kmeans  # noqa: F401
