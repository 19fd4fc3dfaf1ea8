"""BASELINE config-5-class MULTIPASS measurement: 16K x 16K 4-component
CMYK-as-YCCK through the bounded-memory multi-pass pipeline
(`entropy.chunked_multipass.encode_multipass_chunked`) in optimized
and/or progressive mode — the capability the reference exercises via
`encode_blocks` + per-scan streaming at any size (encoder.rs:810-864,
869-975, 1086-1200).  Records wall time, link-adjusted MP/s and the HBM
high-water mark of the coefficient store (VERDICT r4 #6: "no capability
without a cost number").

Input pre-staged in HBM and fed through the device-resident row-source
protocol (the tunneled link never sees the pixels); compressed-byte
fetches and host stuffing ARE included and timed individually.

Usage: python benchmarks/config5_multipass.py [--size 16384]
       [--mode optimized|progressive|optimized-progressive]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from config5_device import make_ycck  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=16384)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--mode", default="optimized",
                   choices=["optimized", "progressive",
                            "optimized-progressive"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import chunked_multipass as cmp_mod
    from tpuenc.entropy import device_encode as de

    w = h = args.size
    ct = ColorType.CMYK_AS_YCCK
    config = EncoderConfig(
        quality=90,
        sampling_factor=SamplingFactor.F_2_2,
        optimize_huffman_table="optimized" in args.mode,
        progressive_scans=4 if "progressive" in args.mode else None,
    )
    print(f"config5 multipass ({args.mode}): {w}x{h} YCCK, "
          f"chunk={args.chunk} MCU rows", flush=True)

    t0 = time.perf_counter()
    cache = f"/tmp/config5_input_{w}x{h}.npy"
    if os.path.exists(cache):
        img = np.load(cache)
    else:
        img = make_ycck(w, h)
        np.save(cache, img)
    print(f"  input ready ({img.nbytes >> 20} MiB) in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    dimg = jax.device_put(img)
    np.asarray(jnp.sum(dimg, dtype=jnp.uint32))
    print(f"  staged to HBM in {time.perf_counter() - t0:.1f}s", flush=True)

    def hbm_stats():
        try:
            s = jax.local_devices()[0].memory_stats()
            return s.get("bytes_in_use", 0), s.get("peak_bytes_in_use", 0)
        except Exception:
            return 0, 0

    base_in_use, _ = hbm_stats()

    timers = {"fetch": 0.0}
    real_fetch = de.fetch_bytes

    def timed_fetch(buf, total):
        t = time.perf_counter()
        r = real_fetch(buf, total)
        timers["fetch"] += time.perf_counter() - t
        return r

    cmp_mod.fetch_bytes = timed_fetch

    def run():
        timers["fetch"] = 0.0
        huffman = [list(pr) for pr in default_tables()]
        payloads = cmp_mod.encode_multipass_chunked(
            lambda y0, n: dimg[y0:y0 + n], w, h, ct, config, huffman,
            chunk_mcu_rows=args.chunk,
        )
        return sum(len(s) for s in payloads), len(payloads)

    t0 = time.perf_counter()
    nb, n_scans = run()
    compile_s = time.perf_counter() - t0
    in_use, peak = hbm_stats()
    print(f"  warm-up (incl. compile) {compile_s:.1f}s, "
          f"{n_scans} scans, output {nb >> 20} MiB", flush=True)
    if peak:
        print(f"  HBM: baseline {base_in_use >> 20} MiB, "
              f"peak during encode {peak >> 20} MiB", flush=True)
    else:
        # axon's PJRT plugin reports no memory_stats; give the analytic
        # coefficient-store footprint (128 B/block) + input instead.
        from tpuenc.kernels.pipeline import scan_layout

        blocks = sum(
            scan_layout(w, h, ct, config)["comp_block_counts"]
        )
        print(f"  HBM (analytic): input {img.nbytes >> 20} MiB + "
              f"coefficient store {blocks * 128 >> 20} MiB "
              f"({blocks} blocks x 128 B) + O(chunk) transients",
              flush=True)

    t0 = time.perf_counter()
    nb, _ = run()
    dt = time.perf_counter() - t0

    # Link-adjusted: re-cost tunnel fetch seconds at a production
    # host-attachment rate (10 GB/s); fetched = compressed scan words +
    # per-block lens (int16) per scan.
    adj = dt - timers["fetch"] + (nb * 1.3) / 10e9
    print(f"  fetch calls {timers['fetch']:.2f}s (of {dt:.2f}s wall)",
          flush=True)
    print(f"config5 {w}x{h} YCCK multipass {args.mode}: "
          f"{w * h / 1e6 / dt:.1f} MP/s wall ({dt:.2f}s, {nb} B out); "
          f"link-adjusted {w * h / 1e6 / adj:.0f} MP/s ({adj:.2f}s)",
          flush=True)


if __name__ == "__main__":
    main()
