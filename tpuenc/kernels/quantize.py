"""Fused zigzag + quantization kernel.

TPU-native equivalent of the reference's ``Operations::quantize_block``
(``/root/reference/src/encoder.rs:1266-1271``) and
``QuantizationTable::quantize`` (``quantization.rs:291-307``): division is an
exact reciprocal multiply-shift (SHIFT=15) with a per-coefficient correction
term, round-half-away-from-zero via ``(|v|+corr)*recip >> 15`` with the sign
restored.  The zigzag reorder is a constant gather fused into the same
elementwise pass; batched over all blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.tables import QUANT_SHIFT, ZIGZAG, QuantizationTable


def quantize_zigzag(dct_blocks, table: QuantizationTable):
    """Quantize a batch of DCT blocks and emit them in zigzag order.

    ``dct_blocks``: int32 (..., 64) natural-order DCT coefficients (x8
    scaled).  Returns int16 (..., 64) zigzag-ordered quantized coefficients,
    bit-exact with the reference.

    Table constants stay as numpy so XLA embeds them as literals instead of
    device-resident arrays.
    """
    zz = dct_blocks[..., ZIGZAG]
    recip = np.asarray(table.reciprocals)[ZIGZAG]
    corr = np.asarray(table.corrections)[ZIGZAG]

    absv = jnp.abs(zz)
    product = ((absv + corr) * recip) >> QUANT_SHIFT
    return jnp.where(zz < 0, -product, product).astype(jnp.int16)
