"""Benchmark harness.

Reproduces the reference's criterion workloads
(``/root/reference/criterion/benches/encode.rs``: 2000x1800 RGB across the
five encode modes, plus fdct and ycbcr micro-benches) and the BASELINE.json
configs, then prints ONE JSON line with the headline metric:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline = baseline q90 4:4:4 RGB encode throughput in megapixels/s on one
chip (BASELINE.md north star: >= 1000 MP/s).  ``vs_baseline`` is measured
against that 1 GP/s target.

Run ``python bench.py --all`` for the full table on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


def make_rgb(w, h, seed=42):
    rng = np.random.default_rng(seed)
    # Smooth-ish synthetic content (criterion uses a synthetic gradient).
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // max(w, 1), yy * 255 // max(h, 1), (xx + yy) * 255 // (w + h)],
        axis=2,
    ).astype(np.int16)
    noise = rng.integers(-24, 24, size=base.shape, dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def bench_encode(encoder_setup, img, w, h, color_type, iters=None, min_time=2.0):
    from tpuenc import Encoder

    def run():
        enc = Encoder(encoder_setup["quality"])
        for k, v in encoder_setup.items():
            if k == "quality":
                continue
            getattr(enc, k)(*v) if isinstance(v, tuple) else getattr(enc, k)(v)
        return enc.encode(img, w, h, color_type)

    out = run()  # warmup (jit compile)
    run()
    times = []
    total = 0.0
    n = 0
    while total < min_time and (iters is None or n < iters):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        times.append(dt)
        total += dt
        n += 1
    best = min(times)
    mp = w * h / 1e6
    return mp / best, len(out), best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true", help="run full suite")
    parser.add_argument("--size", default="2000x1800")
    args = parser.parse_args()

    from tpuenc import ColorType, SamplingFactor

    w, h = (int(x) for x in args.size.split("x"))
    img = make_rgb(w, h)

    results = {}

    # Headline: BASELINE.json config 1 scaled up — q90, default tables,
    # 4:4:4 (quality>=90 default sampling), no restarts.
    mps, size, best = bench_encode({"quality": 90}, img, w, h, ColorType.RGB)
    results["encode rgb q90 4:4:4"] = (mps, size)

    if args.all:
        # The five criterion workloads (encode.rs:95-153).
        for name, setup in [
            ("encode rgb 100", {"quality": 100}),
            (
                "encode rgb 4x1",
                {
                    "quality": 80,
                    "set_sampling_factor": SamplingFactor.F_4_1,
                },
            ),
            ("encode rgb progressive", {"quality": 80, "set_progressive": True}),
            (
                "encode rgb optimized",
                {"quality": 100, "set_optimized_huffman_tables": True},
            ),
            (
                "encode rgb optimized progressive",
                {
                    "quality": 100,
                    "set_optimized_huffman_tables": True,
                    "set_progressive": True,
                },
            ),
            (
                "encode rgb q90 420 restart64",
                {
                    "quality": 90,
                    "set_sampling_factor": SamplingFactor.F_2_2,
                    "set_restart_interval": 64,
                },
            ),
        ]:
            mps, size, best = bench_encode(setup, img, w, h, ColorType.RGB)
            results[name] = (mps, size)

        for name, (mps, size) in results.items():
            print(f"{name:36s} {mps:9.1f} MP/s  {size:9d} B", file=sys.stderr)

    headline = results["encode rgb q90 4:4:4"][0]
    print(
        json.dumps(
            {
                "metric": "baseline_q90_encode_throughput",
                "value": round(headline, 2),
                "unit": "MP/s/chip",
                "vs_baseline": round(headline / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
