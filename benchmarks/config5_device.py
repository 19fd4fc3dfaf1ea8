"""BASELINE config 5 measured device-resident: 16K x 16K 4-component
CMYK-as-YCCK through the production bounded-memory chunked pipeline
(`entropy.chunked.iter_encode_interleaved_chunked`, lookahead-1
dispatch), with the input pre-staged in HBM and fed through the
device-resident row-source protocol so the tunneled host link (absent
in a production host-TPU attachment) never sees the pixels.  Host
finishing (StreamingStuffer) and compressed-byte fetches ARE included —
they are part of the pipeline — and timed individually so the tunnel's
share is visible.

Usage: python benchmarks/config5_device.py [--size 16384] [--chunk 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_ycck(w, h, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (w + h),
         (xx ^ yy) % 160],
        axis=2,
    ).astype(np.int16)
    noise = rng.integers(-20, 20, size=base.shape, dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=16384)
    p.add_argument("--chunk", type=int, default=64)
    args = p.parse_args()

    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import chunked as ch
    from tpuenc.entropy import device_encode as de

    w = h = args.size
    ct = ColorType.CMYK_AS_YCCK
    config = EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_2_2)
    print(f"config5 device-resident: {w}x{h} YCCK, chunk={args.chunk} MCU rows",
          flush=True)

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
    # Force the WHOLE transfer before timing: a device-side reduction
    # consumes every input byte, and fetching its scalar result proves
    # completion (block_until_ready and tiny-slice fetches both return
    # while the tunnel is still streaming the bulk).
    import jax.numpy as jnp

    np.asarray(jnp.sum(dimg, dtype=jnp.uint32))
    print(f"  staged to HBM in {time.perf_counter() - t0:.1f}s", flush=True)

    huffman = [list(pr) for pr in default_tables()]

    # Instrument the two host-side stages without duplicating the loop.
    timers = {"fetch": 0.0, "stuff": 0.0}
    real_fetch = de.fetch_bytes
    real_add = ch.StreamingStuffer.add_chunk

    def timed_fetch(buf, total):
        t = time.perf_counter()
        r = real_fetch(buf, total)
        timers["fetch"] += time.perf_counter() - t
        return r

    def timed_add(self, words, nbits, lens):
        t = time.perf_counter()
        r = real_add(self, words, nbits, lens)
        timers["stuff"] += time.perf_counter() - t
        return r

    ch.fetch_bytes = timed_fetch
    de.fetch_bytes = timed_fetch
    ch.StreamingStuffer.add_chunk = timed_add

    def run():
        timers["fetch"] = timers["stuff"] = 0.0
        out = 0
        for piece in ch.iter_encode_interleaved_chunked(
            lambda y0, n: dimg[y0:y0 + n], w, h, ct, config, huffman,
            chunk_mcu_rows=args.chunk,
        ):
            out += len(piece)
        return out

    t0 = time.perf_counter()
    nb = run()
    compile_s = time.perf_counter() - t0
    print(f"  warm-up (incl. compile) {compile_s:.1f}s, output {nb >> 20} MiB",
          flush=True)
    t0 = time.perf_counter()
    nb = run()
    dt = time.perf_counter() - t0

    # On this rig device->host goes through a tunneled link (~20-50 MB/s);
    # a production host-attached TPU fetches at PCIe rates.  Re-cost the
    # measured fetch seconds at 10 GB/s for the link-adjusted engine rate.
    comps = 10  # YCCK F_2_2 blocks per MCU
    total_blocks = (h // 16) * (w // 16) * comps
    fetched = nb + 2 * total_blocks
    adj = dt - timers["fetch"] + fetched / 10e9
    print(f"  fetch calls {timers['fetch']:.2f}s "
          f"({fetched / 1e6:.0f} MB over the tunnel), "
          f"host stuffer {timers['stuff']:.2f}s (of {dt:.2f}s wall)",
          flush=True)
    print(f"config5 {w}x{h} YCCK chunked device-resident: "
          f"{w * h / 1e6 / dt:.1f} MP/s wall ({dt:.2f}s, {nb} B out); "
          f"link-adjusted {w * h / 1e6 / adj:.0f} MP/s ({adj:.2f}s)",
          flush=True)


if __name__ == "__main__":
    main()
