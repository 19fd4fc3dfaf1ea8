"""Property-based fuzzing (the reference's cargo-fuzz analog, SURVEY §4.5).

The reference drives arbitrary bytes as square images through each encode
mode with the single invariant "never panics"
(fuzz/fuzz_targets/encode_rgb.rs etc.).  Here: random shapes, qualities and
configs through the full encoder; invariants are (a) no exception, (b) a
well-formed JFIF container, (c) the independent decoder accepts the output.
Uses hypothesis when available, otherwise a seeded sweep.
"""

import io
import os

import numpy as np
import pytest

pytest.importorskip("jax")

from tpuenc import ColorType, Encoder, SamplingFactor

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:
    HAVE_HYPOTHESIS = False


FACTORS = list(SamplingFactor)[:8]
CTYPES = [
    ColorType.LUMA,
    ColorType.RGB,
    ColorType.RGBA,
    ColorType.BGR,
    ColorType.BGRA,
    ColorType.YCBCR,
    ColorType.CMYK,
    ColorType.CMYK_AS_YCCK,
    ColorType.YCCK,
]


def _run_case(w, h, quality, ct, factor, progressive, optimized, restart, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(
        0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
    ).tobytes()
    enc = Encoder(quality)
    enc.set_sampling_factor(factor)
    if progressive:
        enc.set_progressive(True)
    if optimized:
        enc.set_optimized_huffman_tables(True)
    if restart:
        enc.set_restart_interval(restart)
    out = enc.encode(data, w, h, ct)
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"

    from PIL import Image

    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (w, h)


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        quality=st.integers(1, 100),
        ct=st.sampled_from(CTYPES),
        factor=st.sampled_from(FACTORS),
        progressive=st.booleans(),
        optimized=st.booleans(),
        restart=st.sampled_from([0, 1, 3, 17]),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_encode(
        w, h, quality, ct, factor, progressive, optimized, restart, seed
    ):
        _run_case(
            w, h, quality, ct, factor, progressive, optimized, restart, seed
        )

if HAVE_HYPOTHESIS:

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        quality=st.integers(1, 100),
        ct=st.sampled_from([ColorType.LUMA, ColorType.RGB, ColorType.CMYK]),
        factor=st.sampled_from(FACTORS[:4]),
        progressive=st.booleans(),
        optimized=st.booleans(),
        restart=st.sampled_from([0, 3]),
        seed=st.integers(0, 2**31),
    )
    @pytest.mark.slow
    def test_fuzz_device_entropy_parity(
        w, h, quality, ct, factor, progressive, optimized, restart, seed
    ):
        """Device entropy path fuzz: strict (no silent host fallback) and
        byte-identical to the host packer on the same inputs."""
        rng = np.random.default_rng(seed)
        data = rng.integers(
            0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
        ).tobytes()

        def run():
            enc = Encoder(quality)
            enc.set_sampling_factor(factor)
            if progressive:
                enc.set_progressive(True)
            if optimized:
                enc.set_optimized_huffman_tables(True)
            if restart:
                enc.set_restart_interval(restart)
            return enc.encode(data, w, h, ct)

        old = os.environ.get("TPUENC_DEVICE_ENTROPY")
        try:
            os.environ["TPUENC_DEVICE_ENTROPY"] = "strict"
            dev = run()
            os.environ["TPUENC_DEVICE_ENTROPY"] = "0"
            host = run()
        finally:
            if old is None:
                os.environ.pop("TPUENC_DEVICE_ENTROPY", None)
            else:
                os.environ["TPUENC_DEVICE_ENTROPY"] = old
        assert dev == host

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        n=st.integers(1, 4),
        quality=st.integers(1, 100),
        ct=st.sampled_from([ColorType.LUMA, ColorType.RGB, ColorType.YCCK]),
        optimized=st.booleans(),
        restart=st.sampled_from([0, 5]),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_encode_batch(
        w, h, n, quality, ct, optimized, restart, seed
    ):
        """encode_batch must be byte-identical to per-image encode."""
        rng = np.random.default_rng(seed)
        imgs = [
            rng.integers(
                0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
            ).tobytes()
            for _ in range(n)
        ]

        def make():
            enc = Encoder(quality)
            if optimized:
                enc.set_optimized_huffman_tables(True)
            if restart:
                enc.set_restart_interval(restart)
            return enc

        batch = make().encode_batch(imgs, w, h, ct)
        singles = [make().encode(im, w, h, ct) for im in imgs]
        assert batch == singles

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_SHARD_EXAMPLES", "6")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        cols=st.integers(1, 3),
        rows=st.integers(1, 12),
        quality=st.integers(1, 100),
        optimized=st.booleans(),
        progressive=st.booleans(),
        restart=st.sampled_from([0, 7]),
        seed=st.integers(0, 2**31),
    )
    @pytest.mark.slow
    def test_fuzz_sharded_encoder(
        cols, rows, quality, optimized, progressive, restart, seed
    ):
        """ShardedEncoder (8 virtual devices) fuzz: byte-identical to the
        single-device encoder for MCU-aligned shapes."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpuenc.shard.encode import ShardedEncoder
        from tpuenc.shard.mesh import make_mesh

        w, h = 16 * cols, 16 * rows
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

        def setup(e):
            e.set_sampling_factor(SamplingFactor.F_2_2)
            if optimized:
                e.set_optimized_huffman_tables(True)
            if progressive:
                e.set_progressive(True)
            if restart:
                e.set_restart_interval(restart)

        senc = ShardedEncoder(quality, make_mesh(8, batch=1))
        setup(senc)
        got = senc.encode(img, w, h, ColorType.RGB)
        ref = Encoder(quality)
        setup(ref)
        assert got == ref.encode(img, w, h, ColorType.RGB)


else:

    def test_fuzz_encode_sweep():
        rng = np.random.default_rng(0)
        for i in range(15):
            _run_case(
                int(rng.integers(1, 40)),
                int(rng.integers(1, 40)),
                int(rng.integers(1, 101)),
                CTYPES[i % len(CTYPES)],
                FACTORS[i % len(FACTORS)],
                bool(i % 2),
                bool(i % 3 == 0),
                [0, 1, 3, 17][i % 4],
                i,
            )


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 48),
        h=st.integers(9, 80),
        quality=st.integers(1, 100),
        ct=st.sampled_from([ColorType.LUMA, ColorType.RGB, ColorType.CMYK]),
        factor=st.sampled_from(FACTORS[:4]),
        restart=st.sampled_from([0, 1, 3, 7, 64]),
        chunk=st.integers(1, 5),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_encode_stream_parity(
        w, h, quality, ct, factor, restart, chunk, seed
    ):
        """encode_stream's concatenated pieces must equal encode()'s bytes
        for arbitrary shapes, sampling, restart intervals and chunk sizes
        (exercises StreamingStuffer's mid-segment flushes, tail padding,
        RST numbering and per-chunk DC chains)."""
        if not SamplingFactor(factor).supports_interleaved():
            factor = SamplingFactor.F_1_1
        rng = np.random.default_rng(seed)
        data = rng.integers(
            0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
        ).tobytes()
        enc = Encoder(quality)
        enc.set_sampling_factor(factor)
        if restart:
            enc.set_restart_interval(restart)
        want = enc.encode(data, w, h, ct)
        enc2 = Encoder(quality)
        enc2.set_sampling_factor(factor)
        if restart:
            enc2.set_restart_interval(restart)
        got = b"".join(
            enc2.encode_stream(data, w, h, ct, chunk_mcu_rows=chunk)
        )
        assert got == want


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(17, 70),
        h=st.integers(33, 120),
        quality=st.integers(40, 100),
        ct=st.sampled_from([ColorType.RGB, ColorType.LUMA, ColorType.YCCK]),
        mode=st.sampled_from(["seq", "prog", "opt", "optprog"]),
        restart=st.sampled_from([0, 2, 7]),
        chunk_rows=st.sampled_from([1, 2, 3]),
        pack_chunk=st.sampled_from([64, 128, 509]),
        seed=st.integers(0, 2**31),
    )
    @pytest.mark.slow
    def test_fuzz_multipass_chunked_parity(
        w, h, quality, ct, mode, restart, chunk_rows, pack_chunk, seed,
    ):
        """Bounded-memory multipass fuzz: random multi-pass configs and
        chunk geometries must be byte-identical to the host oracle (the
        production path for every >DEVICE_BLOCK_LIMIT multi-pass encode)."""
        import tpuenc.api as api
        from tpuenc.entropy import chunked_multipass as cmp_mod

        rng = np.random.default_rng(seed)
        data = rng.integers(
            0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
        ).tobytes()

        def build():
            enc = Encoder(quality)
            if mode in ("prog", "optprog"):
                enc.set_progressive(True)
            if mode in ("opt", "optprog"):
                enc.set_optimized_huffman_tables(True)
            if mode == "seq":
                enc.set_sampling_factor(SamplingFactor.F_4_1)
            if restart:
                enc.set_restart_interval(restart)
            return enc

        old_env = os.environ.get("TPUENC_DEVICE_ENTROPY")
        old_limit = api.DEVICE_BLOCK_LIMIT
        orig = cmp_mod.encode_multipass_chunked

        def forced(*args, **kw):
            kw["chunk_mcu_rows"] = chunk_rows
            kw["pack_chunk"] = pack_chunk
            return orig(*args, **kw)

        try:
            os.environ["TPUENC_DEVICE_ENTROPY"] = "0"
            want = build().encode(data, w, h, ct)
            os.environ["TPUENC_DEVICE_ENTROPY"] = "strict"
            api.DEVICE_BLOCK_LIMIT = 1
            cmp_mod.encode_multipass_chunked = forced
            enc2 = build()
            got = enc2.encode(data, w, h, ct)
            assert enc2.last_encode_path == "device-chunked-multipass"
            assert got == want
        finally:
            cmp_mod.encode_multipass_chunked = orig
            api.DEVICE_BLOCK_LIMIT = old_limit
            if old_env is None:
                os.environ.pop("TPUENC_DEVICE_ENTROPY", None)
            else:
                os.environ["TPUENC_DEVICE_ENTROPY"] = old_env
