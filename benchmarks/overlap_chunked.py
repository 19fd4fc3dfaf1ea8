"""Measure the chunked pipeline's overlap efficiency (VERDICT r3 #5).

Runs the bounded-memory interleaved pipeline
(`iter_encode_interleaved_chunked`, lookahead-1 dispatch) on a
device-resident row source (input already in HBM — no input link cost),
then re-runs the same chunks serially with a sync after every stage to
attribute time to (device compute+sync, output fetch, host stuff).

Reported:
  wall        — pipelined end-to-end time
  serial      — sum of per-stage serial times
  overlap     — (serial - wall) / (serial - max_stage): 1.0 means the
                pipeline fully hides everything but the longest stage

On this rig the fetch stage is tunnel-bound (~20-50 MB/s); on a
production host attachment it is ~0 and steady state approaches
max(device, host-stuff) — the components below let the reader verify
that claim against measured numbers rather than prose.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_rgb  # noqa: E402


def main(w=4096, h=4096, chunk_mcu_rows=64):
    import jax

    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
    from tpuenc.entropy.chunked import (
        StreamingStuffer,
        _build_chunk_fn,
        iter_encode_interleaved_chunked,
    )
    from tpuenc.entropy.device_encode import BUDGET_LADDER, fetch_bytes, \
        tables_to_device
    from tpuenc.entropy.pallas_pack import pack_tables
    import jax.numpy as jnp

    config = EncoderConfig(
        quality=90, sampling_factor=SamplingFactor.F_2_2,
        restart_interval=64,
    )
    img = make_rgb(w, h)
    dimg = jax.device_put(img)
    huffman = [list(p) for p in default_tables()]

    def row_source(y0, n):
        return dimg[y0:y0 + n]

    # Warm (compile) pass.
    t0 = time.perf_counter()
    n = sum(len(p) for p in iter_encode_interleaved_chunked(
        row_source, w, h, ColorType.RGB, config, huffman, chunk_mcu_rows))
    print(f"warm pass {time.perf_counter() - t0:.1f}s, {n} bytes",
          flush=True)

    # Pipelined wall (median of 3).
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out_n = sum(len(p) for p in iter_encode_interleaved_chunked(
            row_source, w, h, ColorType.RGB, config, huffman,
            chunk_mcu_rows))
        walls.append(time.perf_counter() - t0)
    wall = sorted(walls)[1]
    print(f"pipelined wall {wall*1e3:9.1f} ms  ({out_n} bytes)", flush=True)

    # Serial per-stage attribution on the same chunks.
    tabs = tables_to_device(huffman)
    dc_packed, ac_packed = pack_tables(tabs)
    from tpuenc.core.types import init_components, max_sampling

    jct = ColorType.RGB.jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    num_cols = -(-w // (8 * max_h))
    num_rows = -(-h // (8 * max_v))
    bpm = sum(c.vertical_sampling_factor * c.horizontal_sampling_factor
              for c in components)
    total_blocks = num_rows * num_cols * bpm
    rows_per = min(chunk_mcu_rows, num_rows)
    n_full = num_rows // rows_per
    mcu_h = 8 * max_v

    budget = BUDGET_LADDER[0]
    t_dev = t_fetch = t_stuff = 0.0
    fn, spec, pat, _ = _build_chunk_fn(w, rows_per, ColorType.RGB, config,
                                       budget)
    seg = spec.seg_blocks if spec.seg_blocks > 0 else total_blocks
    stuffer = StreamingStuffer(seg, total_blocks)
    prev_tail = jnp.zeros((pat,), jnp.int32)
    go = 0
    out_bytes = 0
    for ci in range(n_full):
        slab = dimg[ci * rows_per * mcu_h:(ci + 1) * rows_per * mcu_h]
        t0 = time.perf_counter()
        outs = fn(slab, prev_tail, jnp.asarray(go, jnp.int32),
                  dc_packed, ac_packed)
        stream, meta, lens, tail = outs
        meta_np = np.asarray(meta)  # sync: device compute complete
        t_dev += time.perf_counter() - t0
        if meta_np[0]:
            fn48, *_ = _build_chunk_fn(w, rows_per, ColorType.RGB, config,
                                       16)
            outs = fn48(slab, prev_tail, jnp.asarray(go, jnp.int32),
                        dc_packed, ac_packed)
            stream, meta, lens, tail = outs
            meta_np = np.asarray(meta)
        prev_tail = tail
        go += rows_per * num_cols * bpm
        nblocks = rows_per * num_cols * bpm
        used = (int(meta_np[1]) + 31) >> 5
        t0 = time.perf_counter()
        wnp = fetch_bytes(stream, used)
        lnp = fetch_bytes(lens, nblocks).astype(np.int64)
        t_fetch += time.perf_counter() - t0
        t0 = time.perf_counter()
        piece = stuffer.add_chunk(wnp, int(meta_np[1]), lnp)
        t_stuff += time.perf_counter() - t0
        out_bytes += len(piece or b"")
    out_bytes += len(stuffer.finish())

    serial = t_dev + t_fetch + t_stuff
    mx = max(t_dev, t_fetch, t_stuff)
    eff = (serial - wall) / (serial - mx) if serial > mx else float("nan")
    print(f"serial stages: device+sync {t_dev*1e3:8.1f} ms | "
          f"fetch {t_fetch*1e3:8.1f} ms | host stuff {t_stuff*1e3:8.1f} ms",
          flush=True)
    print(f"serial total {serial*1e3:9.1f} ms  -> overlap efficiency "
          f"{eff:5.2f}  (1.0 = everything but the longest stage hidden)",
          flush=True)
    mp = w * h / 1e6
    print(f"pipelined throughput {mp/wall:8.1f} MP/s on this rig "
          f"(fetch-bound); max(device,stuff) bound = "
          f"{mp/max(t_dev, t_stuff):8.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()
