"""Micro-bench: plane (H, W) -> coefficient-major (64, B) layouts.

Finds the fastest XLA formulation of the blockify transpose that feeds
fdct_quantize_pallas.  All variants must produce identical values:
out[y*8+x, r*C+c] = plane[8r+y, 8c+x] - 128.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _amortized_ms

H, W = 1800, 2000
PH, PW = 1800, 2000  # already multiples of 8
R, C = PH // 8, PW // 8
B = R * C

plane = jax.device_put(
    np.random.default_rng(0).integers(0, 256, (PH, PW)).astype(np.int16)
)


def check(name, fn, ref, dtype=jnp.int32):
    j = jax.jit(fn)
    out = np.asarray(j(plane))
    assert out.shape == (64, B), (name, out.shape)
    np.testing.assert_array_equal(out.astype(np.int32), ref)
    ms = _amortized_ms(lambda: j(plane))
    print(f"{name:52s} {ms:8.3f} ms")


# reference (numpy)
pn = np.asarray(plane).astype(np.int32) - 128
ref = pn.reshape(R, 8, C, 8).transpose(1, 3, 0, 2).reshape(64, B)


def v_current(p):
    # pipeline's current path: blockify -> (R,C,64) -> flat -> .T, int32
    x = (p - 128).astype(jnp.int32)
    x = x.reshape(R, 8, C, 8)
    x = jnp.swapaxes(x, 1, 2)  # (R,C,8,8)
    flat = x.reshape(-1, 64)
    return flat.T


def v_direct(p):
    x = (p - 128).astype(jnp.int32)
    return x.reshape(R, 8, C, 8).transpose(1, 3, 0, 2).reshape(64, B)


def v_direct_i16(p):
    x = (p - 128).astype(jnp.int16)
    return x.reshape(R, 8, C, 8).transpose(1, 3, 0, 2).reshape(64, B).astype(jnp.int32)


def v_two_step(p):
    # (R,8,C,8) -> (8,8,R,C) as: first (y,x) out of (r,c): transpose to
    # (8, R, C, 8) then (8, 8, R, C)
    x = (p - 128).astype(jnp.int32)
    x = x.reshape(R, 8, C, 8)
    x = x.transpose(1, 0, 2, 3)  # (8, R, C, 8)
    x = x.transpose(0, 3, 1, 2)  # (8, 8, R, C)
    return x.reshape(64, B)


def v_rowsfirst(p):
    # split y first (cheap: stride-8 row slices are sublane moves), then x
    x = (p - 128).astype(jnp.int32)
    x = x.reshape(R, 8, PW)  # (r, y, w)
    x = x.transpose(1, 0, 2).reshape(8, R, C, 8)  # (y, r, c, x)
    x = jnp.moveaxis(x, 3, 1)  # (y, x, r, c)
    return x.reshape(64, B)


def v_gather_lane(p):
    # strided lane slices: for x in 0..8 take every 8th column
    x = (p - 128).astype(jnp.int32)
    x = x.reshape(R, 8, PW)  # (r, y, w)
    cols = [x[:, :, i::8] for i in range(8)]  # each (R, 8, C)
    s = jnp.stack(cols, axis=2)  # (R, 8, 8, C) = (r, y, x, c)
    return s.transpose(1, 2, 0, 3).reshape(64, B)


def v_onehot_mxu(p):
    # selection matmul on MXU: out_yx[r*C+c] = sum_w plane[8r+y, w] S[w, c*8+... ]
    # P2 = plane.reshape(R,8,W) ; for the lane de-interleave use a (W, 64C)?
    # simpler: de-interleave via dot with S (W, 8C): S[w, x*C+c] = (w == 8c+x)
    x = (p - 128).astype(jnp.bfloat16)
    S = np.zeros((PW, 8 * C), np.float32)
    for c in range(C):
        for xx in range(8):
            S[8 * c + xx, xx * C + c] = 1.0
    Sb = jnp.asarray(S, jnp.bfloat16)
    y = jax.lax.dot_general(
        x, Sb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (PH, 8C): [8r+y, x*C+c]
    y = y.reshape(R, 8, 8, C).transpose(1, 2, 0, 3).reshape(64, B)
    return y.astype(jnp.int32)


check("current (blockify + flat.T)", v_current, ref)
check("direct transpose(1,3,0,2)", v_direct, ref)
check("direct int16", v_direct_i16, ref)
check("two-step", v_two_step, ref)
check("rows-first", v_rowsfirst, ref)
check("lane-gather stack", v_gather_lane, ref)
check("one-hot MXU de-interleave", v_onehot_mxu, ref)
