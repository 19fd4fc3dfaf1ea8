"""Benchmark harness.

Reproduces the reference's criterion workloads
(``/root/reference/criterion/benches/encode.rs``: 2000x1800 RGB across the
five encode modes) and the BASELINE.json configs, then prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline: batched end-to-end baseline q90 encode throughput (host pixels
in -> JPEG bytes out) in MP/s on one chip, vs the 1 GP/s/chip north star.
Note the test rig attaches the TPU through a ~30 MB/s tunneled link, so
end-to-end numbers here are transfer-bound; stderr also reports the
device-resident compute throughput, which is the engine's own speed.

``python bench.py --all`` runs the full workload table (stderr).
"""

import argparse
import json
import sys
import time

import numpy as np


def make_rgb(w, h, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // max(w, 1), yy * 255 // max(h, 1), (xx + yy) * 255 // (w + h)],
        axis=2,
    ).astype(np.int16)
    noise = rng.integers(-24, 24, size=base.shape, dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _apply(enc, setup):
    for k, v in setup.items():
        if k == "quality":
            continue
        getattr(enc, k)(v)


def bench_single(setup, img, w, h, color_type, iters=4):
    from tpuenc import Encoder

    def run():
        enc = Encoder(setup["quality"])
        _apply(enc, setup)
        return enc.encode(img, w, h, color_type)

    out = run()  # compile
    run()  # settle
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return w * h / 1e6 / min(times), len(out)


def bench_batch(setup, imgs, w, h, color_type, reps=3):
    from tpuenc import Encoder

    def run():
        enc = Encoder(setup["quality"])
        _apply(enc, setup)
        return enc.encode_batch(imgs, w, h, color_type)

    outs = run()  # compile
    run()  # settle
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    mp = len(imgs) * w * h / 1e6
    return mp / min(times), sum(len(o) for o in outs)


def bench_device_resident(setup, img, w, h, reps=5):
    """Device-resident pixels -> packed scan bytes on device; measures the
    engine's own throughput without the host link."""
    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import device_encode as de

    config = EncoderConfig(
        quality=setup["quality"],
        sampling_factor=setup.get(
            "set_sampling_factor",
            SamplingFactor.F_2_2 if setup["quality"] < 90 else SamplingFactor.F_1_1,
        ),
        restart_interval=setup.get("set_restart_interval"),
    )
    huffman = [list(p) for p in default_tables()]
    tabs = de.tables_to_device(huffman)
    fn, plan, segst = de._build_fused_fn(w, h, ColorType.RGB, config, 16)
    dimg = jax.device_put(img)
    buf, meta = fn(dimg, *tabs)
    _ = np.asarray(meta)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        buf, meta = fn(dimg, *tabs)
        _ = np.asarray(meta)  # forces completion (tiny fetch)
        times.append(time.perf_counter() - t0)
    return w * h / 1e6 / min(times)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--size", default="2000x1800")
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()

    from tpuenc import ColorType, SamplingFactor

    w, h = (int(x) for x in args.size.split("x"))
    img = make_rgb(w, h)
    imgs = [make_rgb(w, h, seed=100 + i) for i in range(args.batch)]

    q90 = {"quality": 90}
    headline, _ = bench_batch(q90, imgs, w, h, ColorType.RGB)
    print(f"batched e2e q90 4:4:4            {headline:9.1f} MP/s", file=sys.stderr)

    try:
        dev_mps = bench_device_resident(q90, img, w, h)
        print(f"device-resident compute q90      {dev_mps:9.1f} MP/s", file=sys.stderr)
    except Exception as e:
        print(f"device-resident bench failed: {e}", file=sys.stderr)

    if args.all:
        single, size = bench_single(q90, img, w, h, ColorType.RGB)
        print(
            f"single-image e2e q90             {single:9.1f} MP/s  {size} B",
            file=sys.stderr,
        )
        for name, setup in [
            ("encode rgb 100", {"quality": 100}),
            ("encode rgb 4x1",
             {"quality": 80, "set_sampling_factor": SamplingFactor.F_4_1}),
            ("encode rgb progressive", {"quality": 80, "set_progressive": True}),
            ("encode rgb optimized",
             {"quality": 100, "set_optimized_huffman_tables": True}),
            ("encode rgb opt progressive",
             {"quality": 100, "set_optimized_huffman_tables": True,
              "set_progressive": True}),
            ("encode q90 420 restart64",
             {"quality": 90, "set_sampling_factor": SamplingFactor.F_2_2,
              "set_restart_interval": 64}),
        ]:
            mps, size = bench_single(setup, img, w, h, ColorType.RGB, iters=2)
            print(f"{name:32s} {mps:9.1f} MP/s  {size:9d} B", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "baseline_q90_batched_encode_throughput",
                "value": round(headline, 2),
                "unit": "MP/s/chip",
                "vs_baseline": round(headline / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
