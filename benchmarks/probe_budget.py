"""Probe intermediate aggregate-budget rungs for dense (q100) content.

ROADMAP item: the q100 rows escalate past budget 8 to 16, where the
aggregate-cap savings of the split block/aggregate schedule vanish
(block caps clamp to >= 16 anyway).  This probe measures overflow and
looped-throughput at candidate rungs between 8 and 16 to size an
intermediate rung.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_rgb, _looped_ms  # noqa: E402


def main():
    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import device_encode as de

    w, h = 2000, 1800
    img = make_rgb(w, h)
    huffman = [list(p) for p in default_tables()]
    tabs = de.tables_to_device(huffman)
    version = de.pack_version()
    config = EncoderConfig(quality=100, sampling_factor=SamplingFactor.F_1_1)
    dimg = jax.device_put(img)
    for budget in [int(a) for a in sys.argv[1:]] or [10, 12, 14, 16]:
        t0 = time.perf_counter()
        fn, plan, segst = de._build_fused_fn(
            w, h, ColorType.RGB, config, budget, version
        )
        # The timed fori_loop XORs the pixel LSBs with the iteration
        # parity, so it only ever sees two distinct inputs: img and
        # img^1.  Check overflow on BOTH so a rung sized exactly at the
        # fit boundary cannot silently clip bits mid-loop (ADVICE r4).
        buf, meta = fn(dimg, *tabs)
        ovf = int(np.asarray(meta)[0])
        _, meta_x = fn(dimg ^ np.uint8(1), *tabs)
        ovf |= int(np.asarray(meta_x)[0])
        compile_s = time.perf_counter() - t0
        if ovf:
            print(f"budget {budget:3d}: OVERFLOW (compile {compile_s:.0f}s)",
                  flush=True)
            continue
        ms = _looped_ms(lambda pxi: fn.raw_fn(pxi, *tabs), dimg)
        mps = w * h / 1e6 / (ms / 1e3)
        print(
            f"budget {budget:3d}: {mps:9.1f} MP/s  {ms:8.2f} ms  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
