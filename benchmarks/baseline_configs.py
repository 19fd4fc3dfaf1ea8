"""BASELINE.json benchmark configurations.

Runs the five canonical configs from BASELINE.json / BASELINE.md:

  1. baseline 512x512 RGB, q90, default tables, 4:4:4, no restarts
  2. 4:2:0 + restart interval 64 on a 4K RGB image (parallel RST segments)
  3. optimized Huffman tables (two-pass) on a 4K image batch
  4. progressive encoding with spectral-selection scans
  5. 4-component CMYK (striped mesh path; the full 16K x 16K multi-host
     run needs a pod slice — here the striped pipeline runs on whatever
     mesh is available and reports per-device scaling)

Usage: python benchmarks/baseline_configs.py [--config N] [--scale-test]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench as benchlib  # noqa: E402


def config1():
    from tpuenc import ColorType, Encoder

    w = h = 512
    img = benchlib.make_rgb(w, h)
    imgs = [benchlib.make_rgb(w, h, seed=i) for i in range(16)]
    Encoder(90).encode_batch(imgs, w, h, ColorType.RGB)  # compile
    Encoder(90).encode_batch(imgs, w, h, ColorType.RGB)  # settle
    t0 = time.perf_counter()
    Encoder(90).encode_batch(imgs, w, h, ColorType.RGB)
    dt = time.perf_counter() - t0
    print(f"config1 512x512 q90 batch16: {len(imgs)*w*h/1e6/dt:.1f} MP/s")


def config2():
    from tpuenc import ColorType, Encoder, SamplingFactor

    w, h = 3840, 2160
    img = benchlib.make_rgb(w, h)

    def enc():
        e = Encoder(90)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        e.set_restart_interval(64)
        return e.encode(img, w, h, ColorType.RGB)

    enc()
    t0 = time.perf_counter()
    out = enc()
    dt = time.perf_counter() - t0
    print(f"config2 4K 4:2:0 restart64: {w*h/1e6/dt:.1f} MP/s ({len(out)} B)")


def config3():
    from tpuenc import ColorType, Encoder

    w, h = 3840, 2160
    imgs = [benchlib.make_rgb(w, h, seed=i) for i in range(2)]

    def enc(i):
        e = Encoder(90)
        e.set_optimized_huffman_tables(True)
        return e.encode(imgs[i], w, h, ColorType.RGB)

    enc(0)
    t0 = time.perf_counter()
    for i in range(len(imgs)):
        enc(i)
    dt = time.perf_counter() - t0
    print(f"config3 4K optimized x{len(imgs)}: {len(imgs)*w*h/1e6/dt:.1f} MP/s")


def config4():
    from tpuenc import ColorType, Encoder

    w, h = 3840, 2160
    img = benchlib.make_rgb(w, h)

    def enc():
        e = Encoder(90)
        e.set_progressive(True)
        return e.encode(img, w, h, ColorType.RGB)

    enc()
    t0 = time.perf_counter()
    enc()
    dt = time.perf_counter() - t0
    print(f"config4 4K progressive: {w*h/1e6/dt:.1f} MP/s")


def config5(size=4096):
    from tpuenc import ColorType, Encoder

    w = h = size
    rng = np.random.default_rng(0)
    cmyk = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)

    def enc():
        return Encoder(90).encode(cmyk, w, h, ColorType.CMYK_AS_YCCK)

    enc()
    t0 = time.perf_counter()
    out = enc()
    dt = time.perf_counter() - t0
    print(f"config5 {size}x{size} YCCK: {w*h/1e6/dt:.1f} MP/s ({len(out)} B)")


def scale_test():
    """Striped-mesh scaling efficiency on an 8-device virtual CPU mesh
    (relative: 1 stripe vs 8 stripes of the coefficient+histogram step)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.shard.mesh import make_mesh
    from tpuenc.shard.stripes import pad_for_stripes, stripe_encode_step

    w, h = 2048, 2048
    config = EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_2_2)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)

    results = {}
    for n in (1, 8):
        mesh = make_mesh(n, batch=1) if n > 1 else make_mesh(1, batch=1)
        fn, geo = stripe_encode_step(w, h, ColorType.RGB, config, mesh)
        px = pad_for_stripes(img, geo)
        out = fn(px)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(fn(px))
        results[n] = (time.perf_counter() - t0) / 3
        print(f"stripes={n}: {results[n]*1000:.1f} ms")
    eff = results[1] / (results[8] * 8)
    print(f"scaling efficiency 1->8: {eff:.2f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, help="0 = all")
    p.add_argument("--scale-test", action="store_true")
    args = p.parse_args()
    if args.scale_test:
        scale_test()
    else:
        runners = [config1, config2, config3, config4, config5]
        for i, r in enumerate(runners, 1):
            if args.config in (0, i):
                r()
