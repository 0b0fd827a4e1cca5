from qdm_tpu.ops.quant_matmul import (  # noqa: F401
    w4a16_matmul, w4a16_matmul_pallas, w4a16_matmul_ref,
    w4a8_matmul_pallas, w4a8_matmul_ref,
    w8a8_matmul, w8a8_matmul_pallas, w8a8_matmul_ref,
    w8a8_matmul_fused, w8a8_matmul_fused_epi,
    w8a8_geglu_fused, w8a8_geglu_ref,
    pack_linear_int4, pack_linear_int8,
    pack_rows_strided, unpack_rows_strided,
    quantize_act_per_token_int, on_tpu)
from qdm_tpu.ops.attention import dot_product_attention  # noqa: F401
