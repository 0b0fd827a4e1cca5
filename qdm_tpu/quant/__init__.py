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
