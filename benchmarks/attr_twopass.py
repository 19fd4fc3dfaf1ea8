"""Stage attribution for the two-pass optimized-table flow (the
reference's `optimized_huffman_tables` criterion modes,
/root/reference/criterion/benches/encode.rs:95-153): coefficients alone,
coefficients+histograms fused (difference = histogram cost), host Annex
K.2 table build, and the pack pass — all device-resident on the real
chip."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _amortized_ms, make_rgb  # noqa: E402


def attr(name, config, w=2000, h=1800):
    import jax
    import jax.numpy as jnp

    from tpuenc.core.types import ColorType
    from tpuenc.entropy import device_encode as de
    from tpuenc.entropy.huffopt import tables_from_histograms

    img = make_rgb(w, h)
    dimg = jax.device_put(img)

    cfn, components, cm = de._build_coeff_hist_fn(w, h, ColorType.RGB, config)
    streams, hists = cfn(dimg)
    # coefficients alone (same inner as cfn uses)
    from tpuenc.kernels.pipeline import _build_coefficients_fn

    coeff_fn, _ = _build_coefficients_fn(w, h, ColorType.RGB, config, False)
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn
    co = jax.jit(lambda px: sum(s.astype(jnp.int32).sum() for s in inner(px)))
    co(dimg)
    ms_coeff = _amortized_ms(lambda: co(dimg))

    # Time cfn returning a device array; _amortized_ms slope-times chains
    # of async dispatches and syncs once per chain, so the tunnel round
    # trip cancels out.
    ms_ch = _amortized_ms(lambda: cfn(dimg)[1][-1][1])

    hists_np = [(np.asarray(d), np.asarray(a)) for d, a in hists]
    t0 = time.perf_counter()
    for _ in range(20):
        opt = [list(p) for p in tables_from_histograms(hists_np)]
    ms_k2 = (time.perf_counter() - t0) / 20 * 1e3

    tabs = de.tables_to_device(opt)
    pfn, plan, segst = de._build_pack_only_fn(
        w, h, ColorType.RGB, config, 16, de.pack_version(), cm=cm
    )
    st = tuple(streams)
    buf, meta = pfn(st, *tabs)
    ms_pack = _amortized_ms(lambda: pfn(st, *tabs))

    print(f"\n{name} ({w}x{h}, {len(plan)} scans)")
    print(f"  coefficients            {ms_coeff:7.2f} ms")
    print(f"  coeff + histograms      {ms_ch:7.2f} ms  (hist ~= "
          f"{ms_ch - ms_coeff:.2f} ms)")
    print(f"  host K.2 (4 tables)     {ms_k2:7.2f} ms")
    print(f"  pack                    {ms_pack:7.2f} ms")
    total = ms_ch + ms_k2 + ms_pack
    print(f"  total                   {total:7.2f} ms  -> "
          f"{w * h / 1e6 / (total / 1e3):.0f} MP/s")


def main():
    from tpuenc.core.types import EncoderConfig, SamplingFactor

    attr(
        "optimized (q100 4:4:4)",
        EncoderConfig(
            quality=100, sampling_factor=SamplingFactor.F_1_1,
            optimize_huffman_table=True,
        ),
    )
    attr(
        "optimized progressive (q100, 4 scans)",
        EncoderConfig(
            quality=100, sampling_factor=SamplingFactor.F_2_2,
            progressive_scans=4, optimize_huffman_table=True,
        ),
    )


if __name__ == "__main__":
    main()
