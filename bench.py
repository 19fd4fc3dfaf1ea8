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


def _amortized_ms(fn_call, reps=3, k=8):
    """Per-iteration device time via slope timing: the test rig's link has a
    ~30 ms sync round-trip and an async dispatch queue, so single-dispatch
    wall times measure the link, not the chip.  Timing K dispatches vs one
    (each chain ended by a tiny fetch) cancels both."""

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn_call()
        leaf = r[-1] if isinstance(r, tuple) else r
        np.asarray(leaf).ravel()[:1]
        return time.perf_counter() - t0

    run(1)  # settle
    t1 = min(run(1) for _ in range(reps))
    tk = min(run(k) for _ in range(reps))
    est = (tk - t1) / (k - 1)
    # The single-dispatch baseline t1 carries the link's ~±5 ms round-trip
    # jitter; keep the chain's device-work signal >= ~120 ms so that
    # jitter is <5% of the slope (25 ms signals gave ±15% run-to-run
    # spread on the round-4 captures).
    if est * (k - 1) < 0.12:
        k = max(k, int(0.12 / max(est, 1e-5)) + 1)
        tk = min(run(k) for _ in range(reps))
        est = (tk - t1) / (k - 1)
    return max(est * 1e3, 1e-6)


def _looped_ms(body, px, n_loop=64, k=4, reps=3):
    """Per-iteration device time of ``body(pixels) -> arrays`` via an
    in-jit ``lax.fori_loop``: ONE dispatch covers n_loop full iterations
    of pure device work, so the tunnel's dispatch-rate jitter (±15% on
    per-dispatch slope timing) cancels.  The body input is XORed with the
    iteration parity so XLA cannot hoist the loop-invariant computation;
    every output leaf folds into the carry so no stage is dead code.
    Returns milliseconds per iteration from a two-point chain slope."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop_run(p):
        def b(i, carry):
            pxi = p ^ (i & 1).astype(p.dtype)
            acc = carry
            for o in jax.tree_util.tree_leaves(body(pxi)):
                acc = acc + jax.lax.convert_element_type(
                    jnp.sum(o), jnp.uint32
                )
            return acc
        return jax.lax.fori_loop(0, n_loop, b, jnp.uint32(0))

    np.asarray(loop_run(px))  # compile + settle

    def chain(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = loop_run(px)
        np.asarray(r)
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(reps))
    tk = min(chain(k) for _ in range(reps))
    return (tk - t1) / ((k - 1) * n_loop) * 1e3


def bench_device_resident(setup, img, w, h, reps=3, n_loop=64, k=4):
    """Device-resident pixels -> packed scan bytes on device; measures the
    engine's own throughput without the host link.

    The headline timing runs the WHOLE fused program inside a
    ``lax.fori_loop`` (one dispatch per measurement, ~n_loop*k iterations
    of pure device work per sync): per-dispatch slope timing rides the
    tunnel's dispatch rate and showed ±15% run-to-run spread.  The loop
    body XORs the pixel LSBs with the iteration parity so XLA cannot
    hoist the (loop-invariant) encode out of the loop, and folds the
    output buffer into the carry so no stage is dead code."""
    import jax
    import jax.numpy as jnp

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
    version = de.pack_version()
    dimg = jax.device_put(img)
    # Budget selection mirrors production: start at the ladder bottom,
    # escalate on overflow (the aggregate caps are statistical).
    # The timed fori_loop XORs the pixel LSBs with the iteration parity,
    # so check overflow on BOTH inputs it will see — a rung sized exactly
    # at the fit boundary must not silently clip bits mid-loop.
    for budget in de.BUDGET_LADDER:
        fn, plan, segst = de._build_fused_fn(
            w, h, ColorType.RGB, config, budget, version
        )
        buf, meta = fn(dimg, *tabs)
        ovf = int(np.asarray(meta)[0])
        if not ovf:
            _, meta_x = fn(dimg ^ np.uint8(1), *tabs)
            ovf = int(np.asarray(meta_x)[0])
        if not ovf:
            break
    else:
        raise AssertionError("budget overflow in bench at max budget")

    raw = fn.raw_fn
    ms = _looped_ms(
        lambda pxi: raw(pxi, *tabs), dimg, n_loop=n_loop, k=k, reps=reps
    )
    return w * h / 1e6 / (ms / 1e3), version, budget


def bench_stages(setup, img, w, h, budget=None):
    """Per-stage device timing table: coefficient pipeline, entropy pack,
    and the fdct/color micro-benches mirroring the reference's
    criterion/benches/fdct.rs and ycbcr.rs."""
    import jax
    import jax.numpy as jnp

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import device_encode as de
    from tpuenc.kernels.pipeline import coefficients_fn
    from tpuenc.kernels.color_convert import to_planes
    from tpuenc.kernels.fdct import fdct_blocks

    config = EncoderConfig(
        quality=setup["quality"], sampling_factor=SamplingFactor.F_1_1
    )
    if budget is None:
        budget = de.BUDGET_LADDER[0]
    rows = []

    coeff_fn, layout = coefficients_fn(w, h, ColorType.RGB, config)
    version = de.pack_version()
    plan = de.build_scan_plan(layout, layout["components"], config)
    # Measure the layout the fused path actually runs: coefficient-major
    # on the Pallas+v2 path, block-major otherwise.  The cm micro-bench
    # below assumes a single-scan plan; multi-scan configs take the
    # block-major branch.
    cm = (
        version == "v2"
        and coeff_fn.raw_fn_cm is not None
        and len(plan) == 1
    )
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn
    dimg = jax.device_put(img)
    # Reduce to a scalar inside jit so timing excludes the result transfer.
    cf = jax.jit(
        lambda px: sum(s.astype(jnp.int32).sum() for s in inner(px))
    )
    cf(dimg)
    ms = _amortized_ms(lambda: cf(dimg))
    from tpuenc.kernels.pipeline import _use_pallas_fdct

    fdct_path = "pallas-cm" if cm else (
        "pallas" if _use_pallas_fdct() else "xla"
    )
    rows.append((f"coefficients (color+fdct+quant, {fdct_path})", ms))

    # Entropy pack alone on the real coefficient stream.
    streams = tuple(jnp.asarray(s) for s in jax.jit(inner)(dimg))
    if cm:  # cm already implies len(plan) == 1 (see its definition above)
        from tpuenc.entropy.pallas_pack import device_scan_pack, pack_tables

        huffman = [list(p) for p in default_tables()]
        dc_p, ac_p = pack_tables(de.tables_to_arrays(huffman))
        ((_, spec, _),) = plan
        pk = jax.jit(
            lambda s: device_scan_pack(s, spec, dc_p, ac_p, budget,
                                       cm=True)[:2]
        )
        pk(streams[0])
        ms = _amortized_ms(lambda: pk(streams[0]))
    else:
        pfn, plan, segst = de._build_pack_only_fn(
            w, h, ColorType.RGB, config, budget, version
        )
        huffman = [list(p) for p in default_tables()]
        tabs = de.tables_to_device(huffman)
        pfn(streams, *tabs)
        ms = _amortized_ms(lambda: pfn(streams, *tabs))
    rows.append((f"entropy pack ({version}{'-cm' if cm else ''})", ms))

    # fdct micro-bench (criterion fdct.rs analog, batched form).  Outputs
    # reduce to a scalar inside jit so timing excludes the result transfer.
    blocks = jnp.asarray(
        (np.random.default_rng(0).integers(-128, 128, (w * h // 64, 8, 8))
         ).astype(np.int32)
    )
    f = jax.jit(lambda b: fdct_blocks(b).sum())
    f(blocks)
    ms = _amortized_ms(lambda: f(blocks))
    rows.append(("fdct micro (all blocks)", ms))

    # color conversion micro-bench (criterion ycbcr.rs analog).
    g = jax.jit(
        lambda px: sum(p.sum() for p in to_planes(px, ColorType.RGB))
    )
    g(dimg)
    ms = _amortized_ms(lambda: g(dimg))
    rows.append(("rgb->ycbcr micro (whole image)", ms))
    return rows


def profile_trace(setup, img, w, h, trace_dir):
    """Capture a jax.profiler trace of the warm fused encode program
    (SURVEY §5 tracing: attribute device time per kernel/fusion)."""
    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy import device_encode as de

    config = EncoderConfig(
        quality=setup["quality"], sampling_factor=SamplingFactor.F_1_1
    )
    huffman = [list(p) for p in default_tables()]
    tabs = de.tables_to_device(huffman)
    fn, _, _ = de._build_fused_fn(
        w, h, ColorType.RGB, config, 16, de.pack_version()
    )
    dimg = jax.device_put(img)
    buf, meta = fn(dimg, *tabs)  # warm (compile outside the trace)
    np.asarray(meta)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            buf, meta = fn(dimg, *tabs)
        np.asarray(meta)
    print(f"profiler trace written to {trace_dir}", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--size", default="2000x1800")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler trace of the warm fused encode "
        "program into DIR (open with tensorboard/xprof)",
    )
    parser.add_argument(
        "--no-e2e", action="store_true",
        help="skip the link-bound batched e2e headline (device-resident "
        "numbers only; faster iteration on tunneled rigs)",
    )
    args = parser.parse_args()

    from tpuenc import ColorType, SamplingFactor

    w, h = (int(x) for x in args.size.split("x"))
    img = make_rgb(w, h)
    imgs = [make_rgb(w, h, seed=100 + i) for i in range(args.batch)]

    q90 = {"quality": 90}
    headline = 0.0
    if not args.no_e2e:
        headline, _ = bench_batch(q90, imgs, w, h, ColorType.RGB)
        print(
            f"batched e2e q90 4:4:4            {headline:9.1f} MP/s",
            file=sys.stderr,
        )

    if args.profile:
        profile_trace(q90, img, w, h, args.profile)

    dev_mps = None
    try:
        dev_mps, version, budget = bench_device_resident(q90, img, w, h)
        print(
            f"device-resident compute q90      {dev_mps:9.1f} MP/s"
            f"  (pack={version}, budget={budget})",
            file=sys.stderr,
        )
        for name, ms in bench_stages(q90, img, w, h, budget=budget):
            print(f"  {name:34s} {ms:8.2f} ms", file=sys.stderr)
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

        # Streaming encode (O(chunk) memory sink path).
        from tpuenc import Encoder

        enc = Encoder(90)
        enc.set_restart_interval(64)
        t0 = time.perf_counter()
        n = sum(len(p) for p in enc.encode_stream(img, w, h, ColorType.RGB))
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = sum(len(p) for p in enc.encode_stream(img, w, h, ColorType.RGB))
        dt = time.perf_counter() - t0
        print(
            f"{'encode_stream q90 restart64':32s} {w*h/1e6/dt:9.1f} MP/s"
            f"  {n:9d} B  ({enc.last_encode_path})",
            file=sys.stderr,
        )

    # The headline metric is the device-resident engine throughput (the
    # e2e number on this rig is bounded by a ~30 MB/s tunneled link, which
    # a production host-TPU attachment does not have).  Never publish a
    # zero: a failed device bench with --no-e2e is an ERROR, not a
    # regression-to-zero in the tracked metric stream.
    if not dev_mps and headline <= 0:
        print("no valid measurement produced", file=sys.stderr)
        sys.exit(1)
    value = dev_mps if dev_mps else headline
    print(
        json.dumps(
            {
                "metric": "device_resident_q90_encode_throughput",
                "value": round(value, 2),
                "unit": "MP/s/chip",
                "vs_baseline": round(value / 1000.0, 4),
                "e2e_link_bound_mps": round(headline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
