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
import sys as _sys
budget = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8


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


# P3 (fold rearrangement + kernel) and P4 (concat) split, mirroring
# merge_pack_stream's internals on the real P1 output.
def p3_p4(words, lens):
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
    cap_out = caps[-1]
    p2 = pp._build_merge_chunks_fn(n1p, n2, capB, cap_out, n_sub, budget, False)
    out_w, out_l = p2(L, X)

    n2p = 1 << (n2 - 1).bit_length()
    capP = -(-cap_out // 128) * 128
    budget_eff = budget * chunk
    plan3 = pp.fold_plan(n2p, capP, n_sub, budget_eff)
    s_tile, caps_f = plan3
    capF = caps_f[-1]
    G = n_sub // s_tile

    def p3_stage(out_w, out_l):
        w3 = jnp.transpose(out_w, (2, 0, 1))
        w3 = jnp.pad(w3, ((0, 0), (0, n2p - n2), (0, capP - cap_out)))
        w3 = jnp.transpose(w3.reshape(G, s_tile, n2p, capP), (0, 2, 1, 3))
        l3 = jnp.transpose(out_l[:, 0, :], (1, 0))
        l3 = jnp.pad(l3, ((0, 0), (0, n2p - n2)))
        l3 = jnp.transpose(l3.reshape(G, s_tile, n2p), (0, 2, 1))
        p3 = pp._build_fold_rows_fn(n2p, capP, capF, n_sub, s_tile,
                                    budget_eff, False)
        rows, l8 = p3(l3, w3)
        return rows.reshape(n_sub, capF), l8.reshape(n_sub, 8)

    jp3 = jax.jit(p3_stage)
    rows, l8 = jp3(out_w, out_l)
    ms = _amortized_ms(lambda: jp3(out_w, out_l))
    print(f"{'P3 (rearrange + fold kernel)':40s} {ms:8.3f} ms")

    row_bits = l8[:, 0]

    def p4_stage(rows, row_bits):
        pos = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_bits)[:-1]]
        ).astype(jnp.int32)
        R = n_sub
        capW = -(-(R * capF + capF + 256) // 128) * 128
        p4 = pp._build_concat_rows_fn(R, capF, capW, False)
        return p4(pos, row_bits.astype(jnp.int32), rows)

    jp4 = jax.jit(p4_stage)
    jp4(rows, row_bits)
    ms = _amortized_ms(lambda: jp4(rows, row_bits))
    print(f"{'P4 (row concat kernel)':40s} {ms:8.3f} ms")
    print("capF:", capF, "rows:", rows.shape)


p3_p4(words, lens)
