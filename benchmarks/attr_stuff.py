"""Measure the device-side realign+stuff pass (TPUENC_DEVICE_STUFF=1)
against the host finish it replaces (VERDICT r3 #4: 'a measured
device-cost delta').  Flagship 2000x1800 q90 4:4:4 with restart
interval 64."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_rgb, _amortized_ms  # noqa: E402


def main():
    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import device_encode as de
    from tpuenc.entropy import native
    from tpuenc.entropy.device_stuff import device_stuff

    w, h = 2000, 1800
    config = EncoderConfig(
        quality=90, sampling_factor=SamplingFactor.F_1_1,
        restart_interval=64,
    )
    img = make_rgb(w, h)
    huffman = [list(p) for p in default_tables()]
    tabs = de.tables_to_device(huffman)
    version = de.pack_version()
    dimg = jax.device_put(img)
    for budget in de.BUDGET_LADDER:
        fn, plan, seg_structure = de._build_fused_fn(
            w, h, ColorType.RGB, config, budget, version
        )
        buf, meta = fn(dimg, *tabs)
        meta_np = np.asarray(meta)
        if not meta_np[0]:
            break
    n_scans = len(plan)
    seg_bits = meta_np[1 + n_scans:]
    print(f"stream: {int(meta_np[1:1+n_scans].sum())} bits, "
          f"{len(seg_bits)} segments, budget={budget}", flush=True)

    # Device pass alone.
    out, seg_out, _ = device_stuff(buf, seg_bits, seg_structure)
    ms_dev = _amortized_ms(
        lambda: device_stuff(buf, seg_bits, seg_structure)[:2]
    )
    total = int(np.asarray(seg_out).sum())
    print(f"device stuff pass: {ms_dev:8.3f} ms  ({total} output bytes)",
          flush=True)

    # Host finish it replaces (native realign on the fetched words).
    total_words = (int(meta_np[1:1+n_scans].sum()) + 31) >> 5
    wnp = de.fetch_bytes(buf, total_words)
    data = wnp.astype(">u4").tobytes()
    segs = seg_bits.astype(np.int64)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        native.realign_segments(data, segs, bit_offset=0)
    ms_host = (time.perf_counter() - t0) / reps * 1e3
    print(f"host realign+stuff:  {ms_host:8.3f} ms  (native, all cores)",
          flush=True)
    print(
        f"delta: device pass {'saves' if ms_dev < ms_host else 'costs'} "
        f"{abs(ms_host - ms_dev):.3f} ms vs host on the critical path "
        f"(host path overlaps batch compute for free; device path frees "
        f"host cores)", flush=True,
    )


if __name__ == "__main__":
    main()
