"""Int-k bit packing.

Two layouts:

1. **Canonical TPU layout** (`pack_rows`/`unpack_rows`): integer codes
   for a (K, N) = (in_features, out_features) weight are packed along K,
   straight LSB-first nibble order, into an int32 array of shape
   (K / elems_per_word, N).  Per-group `scales`/`zeros` are (K/g, N).
   This keeps the lane (=N, output-channel) axis dense so the Pallas
   W4A16 kernel can unpack with vectorized shifts and feed the MXU
   without transposition.

2. **AWQ interop layout** (`unpack_awq_layout`, `awq_to_canonical`,
   `dequantize_gemm`): the AutoAWQ on-disk format — codes packed along
   the *output* axis with the interleaved AWQ_ORDER — so checkpoints
   produced by the reference stack load directly.
   (reference: utils/packing_utils.py:4-102, utils/quant_utils.py:14-160)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)
AWQ_REVERSE_ORDER = (0, 4, 1, 5, 2, 6, 3, 7)


def elems_per_word(bits: int) -> int:
    assert 32 % bits == 0, f"bits={bits} must divide 32"
    return 32 // bits


# ---------------------------------------------------------------------------
# canonical TPU layout
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits",))
def pack_rows(icodes, bits: int = 4):
    """Pack unsigned integer codes (K, N) -> (K/epw, N) int32 along K.

    LSB-first: code at row k lands in bit-slot (k % epw) of word k//epw.
    """
    epw = elems_per_word(bits)
    k, n = icodes.shape
    assert k % epw == 0, f"K={k} not divisible by {epw}"
    w = icodes.astype(jnp.uint32).reshape(k // epw, epw, n)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, :, None]
    packed = jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bits",))
def unpack_rows(qweight, bits: int = 4):
    """Inverse of pack_rows: (K/epw, N) int32 -> (K, N) int32 codes."""
    epw = elems_per_word(bits)
    kw, n = qweight.shape
    w = qweight.astype(jnp.uint32)[:, None, :]
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, :, None]
    codes = (w >> shifts) & jnp.uint32(2**bits - 1)
    return codes.reshape(kw * epw, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# AWQ on-disk layout interop
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits",))
def unpack_awq_layout(qweight, qzeros, bits: int = 4):
    """Column-wise unpack of AutoAWQ tensors (packing_utils.py:8-26).

    qweight: (K, N/epw) int32, qzeros: (K/g, N/epw) int32.
    Returns (iweights (K, N), izeros (K/g, N)) int32 — still in AWQ
    interleaved order."""
    shifts = jnp.arange(0, 32, bits, dtype=jnp.uint32)

    def _unpack(q):
        u = q.astype(jnp.uint32)[:, :, None] >> shifts[None, None, :]
        u = u & jnp.uint32(2**bits - 1)
        return u.reshape(q.shape[0], -1).astype(jnp.int32)

    iweights = _unpack(qweight)
    izeros = _unpack(qzeros) if qzeros is not None else None
    return iweights, izeros


def _reverse_order_indices(n: int, bits: int) -> np.ndarray:
    """Permutation undoing the AWQ interleave (packing_utils.py:29-43)."""
    epw = elems_per_word(bits)
    idx = np.arange(n, dtype=np.int64).reshape(-1, epw)
    assert epw == 8, "AWQ order is defined for 4-bit (8 elems/word)"
    idx = idx[:, list(AWQ_REVERSE_ORDER)]
    return idx.reshape(-1)


def reverse_awq_order(iweights, izeros, bits: int = 4):
    """Undo the AWQ interleave on unpacked codes
    (packing_utils.py:29-43)."""
    perm = _reverse_order_indices(iweights.shape[-1], bits)
    iweights = iweights[:, perm]
    if izeros is not None:
        izeros = izeros[:, perm]
    return iweights, izeros


def dequantize_gemm(qweight, qzeros, scales, bits: int = 4, group_size: int = 128):
    """AWQ-layout -> float weight (K, N) (packing_utils.py:87-102)."""
    iweight, izeros = unpack_awq_layout(qweight, qzeros, bits)
    iweight, izeros = reverse_awq_order(iweight, izeros, bits)
    scales = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    izeros = jnp.repeat(izeros, group_size, axis=0)
    return (iweight - izeros).astype(jnp.float32) * scales


def apply_awq_order(iweights, izeros, bits: int = 4):
    """Apply the AWQ interleave to plain codes — the exact inverse of
    :func:`reverse_awq_order` (forward direction of
    packing_utils.py:29-43, used when WRITING AutoAWQ checkpoints)."""
    epw = elems_per_word(bits)
    assert epw == 8, "AWQ order is defined for 4-bit (8 elems/word)"
    n = iweights.shape[-1]
    perm = np.arange(n, dtype=np.int64).reshape(-1, epw)[
        :, list(AWQ_ORDER)].reshape(-1)
    iweights = iweights[:, perm]
    if izeros is not None:
        izeros = izeros[:, perm]
    return iweights, izeros


def pack_awq_layout(iweights, izeros, bits: int = 4):
    """Column-wise pack of plain int codes into the AutoAWQ word layout
    — the exact inverse of :func:`unpack_awq_layout` (the codes must
    already carry the AWQ interleave; see :func:`apply_awq_order`).

    iweights: (K, N) -> (K, N/epw) int32; izeros: (K/g, N) ->
    (K/g, N/epw) int32 (or None)."""
    epw = elems_per_word(bits)

    def _pack(x):
        k, n = x.shape
        assert n % epw == 0, f"N={n} not divisible by {epw}"
        w = x.astype(jnp.uint32).reshape(k, n // epw, epw)
        shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, None, :]
        return jnp.sum(w << shifts, axis=2,
                       dtype=jnp.uint32).astype(jnp.int32)

    return _pack(iweights), (_pack(izeros) if izeros is not None else None)


def canonical_to_awq(icodes_kn, izeros_gn, scales_gn, bits: int = 4):
    """Plain unsigned codes (K, N) + integer zeros (K/g, N) -> AutoAWQ
    on-disk tensors (qweight (K, N/epw) int32, qzeros (K/g, N/epw)
    int32, scales (K/g, N)) — the inverse of :func:`awq_to_canonical`
    modulo the row packing (callers unpack the strided kernel buffers
    first)."""
    iw, iz = apply_awq_order(jnp.asarray(icodes_kn),
                             jnp.asarray(izeros_gn), bits)
    qweight, qzeros = pack_awq_layout(iw, iz, bits)
    return qweight, qzeros, jnp.asarray(scales_gn)


def pack_gptq_layout(icodes_kn, izeros_gn, bits: int = 4,
                     plus_one: bool = True):
    """Plain unsigned codes -> AutoGPTQ on-disk tensors: ROW-packed
    qweight (K/epw, N) (== :func:`pack_rows`, GPTQ packs sequentially,
    no interleave) + COLUMN-packed qzeros (K/g, N/epw).

    plus_one=True writes the legacy checkpoint_format='gptq' zeros
    MINUS ONE (the historical off-by-one every loader undoes);
    plus_one=False writes 'gptq_v2' true zeros.  Legacy export refuses
    zero points of 0 (they would wrap to 15 and reload as 16 — the
    historical corruption the v2 format exists to fix)."""
    iz = jnp.asarray(izeros_gn)
    if plus_one:
        if bool(jnp.any(iz < 1)):
            raise ValueError(
                "legacy 'gptq' checkpoint_format stores zeros-1 and "
                "cannot represent a zero point of 0; export with "
                "checkpoint_format='gptq_v2'")
        iz = iz - 1
    qweight = pack_rows(jnp.asarray(icodes_kn), bits)
    # column-pack the zeros (same word layout as AWQ, no interleave)
    epw = elems_per_word(bits)
    g, n = iz.shape
    w = iz.astype(jnp.uint32).reshape(g, n // epw, epw)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * bits)[None, None, :]
    qzeros = jnp.sum(w << shifts, axis=2, dtype=jnp.uint32).astype(jnp.int32)
    return qweight, qzeros


def awq_to_canonical(qweight, qzeros, scales, bits: int = 4):
    """Convert AutoAWQ on-disk tensors to the canonical TPU layout.

    Returns (qweight_rows (K/epw, N) int32, scales (K/g, N) f32,
    zeros (K/g, N) f32)."""
    iweight, izeros = unpack_awq_layout(qweight, qzeros, bits)
    iweight, izeros = reverse_awq_order(iweight, izeros, bits)
    return (
        pack_rows(iweight, bits),
        scales.astype(jnp.float32),
        izeros.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# GPTQ (AutoGPTQ / gptqmodel) on-disk layout interop
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits", "plus_one"))
def unpack_gptq_layout(qweight, qzeros, bits: int = 4,
                       plus_one: bool = True):
    """Unpack AutoGPTQ on-disk tensors.

    qweight is ROW-packed (K/epw, N) int32 LSB-first (exactly our
    pack_rows layout — GPTQ packs sequentially, no AWQ interleave);
    qzeros is COLUMN-packed (K/g, N/epw) int32 LSB-first.  The legacy
    checkpoint_format='gptq' stores zeros MINUS ONE (the historical
    AutoGPTQ off-by-one every loader must undo); plus_one=True
    restores the true zero points.  'gptq_v2' checkpoints store true
    zeros (plus_one=False).  Returns (iweights (K, N),
    izeros (K/g, N)) int32."""
    iw = unpack_rows(qweight, bits)
    iz = None
    if qzeros is not None:
        shifts = jnp.arange(0, 32, bits, dtype=jnp.uint32)
        u = qzeros.astype(jnp.uint32)[:, :, None] >> shifts[None, None, :]
        u = (u & jnp.uint32(2 ** bits - 1)).reshape(
            qzeros.shape[0], -1).astype(jnp.int32)
        iz = u + (1 if plus_one else 0)
    return iw, iz


def dequantize_gptq(qweight, qzeros, scales, g_idx=None, bits: int = 4,
                    group_size: int = 128, plus_one: bool = True):
    """Dequantize an AutoGPTQ linear to float (K, N) — the exact values
    any GPTQ kernel computes with: (code - zero) * scale with the row's
    group chosen by g_idx (desc_act reorders GROUP MEMBERSHIP, not the
    stored rows)."""
    iw, iz = unpack_gptq_layout(qweight, qzeros, bits, plus_one=plus_one)
    k = iw.shape[0]
    rows = (jnp.asarray(g_idx, jnp.int32) if g_idx is not None
            else jnp.arange(k, dtype=jnp.int32) // group_size)
    z = iz[rows] if iz is not None else 0
    return (iw - z).astype(jnp.float32) * scales.astype(jnp.float32)[rows]
