"""Attribution of the v2 pack pipeline stages (P1 tile kernel, P2 chunk
merge, P3 fold, P4 concat) on the real coefficient stream."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _amortized_ms, make_rgb
from tpuenc.core.tables import default_tables
from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
from tpuenc.entropy import device_encode as de
from tpuenc.entropy import pallas_pack as pp
from tpuenc.kernels.pipeline import coefficients_fn

W, H = 2000, 1800
img = make_rgb(W, H)
config = EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_1_1)

coeff_fn, layout = coefficients_fn(W, H, ColorType.RGB, config)
assert coeff_fn.raw_fn_cm is not None, (
    "coefficient-major pipeline unavailable: run on TPU or set "
    "TPUENC_PALLAS_FDCT=1"
)
dimg = jax.device_put(img)
stream_cm = jax.jit(coeff_fn.raw_fn_cm)(dimg)[0]
stream_cm = jax.block_until_ready(stream_cm)
print("stream:", stream_cm.shape, stream_cm.dtype)

huffman = [list(p) for p in default_tables()]
dc_p, ac_p = pp.pack_tables(de.tables_to_arrays(huffman))
plan = de.build_scan_plan(layout, layout["components"], config)
((_, spec, _),) = plan
budget = 16


def t(name, f, *args):
    j = jax.jit(f)
    r = j(*args)
    ms = _amortized_ms(lambda: j(*args))
    print(f"{name:40s} {ms:8.3f} ms")
    return jax.block_until_ready(r)


# P1 alone
words, lens, ovf = t(
    "P1 scan_pack_blocks (cm)",
    lambda s: pp.scan_pack_blocks(s, spec, dc_p, ac_p, budget, cm=True),
    stream_cm,
)
print("ovf:", bool(np.asarray(ovf)), "capB:", words.shape)

# full device_scan_pack
t(
    "P1+P2+P3+P4 device_scan_pack (cm)",
    lambda s: pp.device_scan_pack(s, spec, dc_p, ac_p, budget, cm=True)[:2],
    stream_cm,
)


# P2..P4 alone on fixed P1 output
def rest(words, lens):
    Bp, capB = words.shape
    n_sub, chunk = 128, 256
    n1 = -(-Bp // n_sub)
    n1p = -(-n1 // chunk) * chunk
    total = n_sub * n1p
    if total != Bp:
        words = jnp.pad(words, ((0, total - Bp), (0, 0)))
        lens = jnp.pad(lens, (0, total - Bp))
    X = jnp.transpose(words.reshape(n_sub, n1p, capB), (1, 2, 0))
    L = jnp.transpose(lens.reshape(n_sub, n1p, 1), (1, 2, 0))
    n2 = n1p // chunk
    caps = pp.chunk_caps(capB, chunk, budget)
    p2 = pp._build_merge_chunks_fn(n1p, n2, capB, caps[-1], n_sub, budget, False)
    out_w, out_l = p2(L, X)
    return out_w, out_l


t("P2 (transpose + chunk merge)", rest, words, lens)
