"""tpuenc — a TPU-native JPEG encode engine.

A from-scratch JAX/XLA/Pallas re-design with the full capability set of the
reference Rust encoder (vstroebel/jpeg-encoder, mounted at
``/root/reference``): baseline interleaved, sequential and progressive
(spectral selection) JFIF encoding; 9 input color formats; all 8 sampling
factors; 9 quantization presets + custom tables with libjpeg quality
scaling; default K.3 and two-pass K.2-optimized Huffman tables; restart
intervals; APP segments / ICC / EXIF metadata; pixel density.

Architecture: pixels -> quantized coefficients is one jitted batched TPU
program (color convert, edge pad, subsample, fDCT, zigzag+quantize);
entropy coding is parallelized over restart segments / DC-predictor-known
chunks in a native C++ packer; multi-device scaling shards MCU-row stripes
over a ``jax.sharding.Mesh`` exchanging only histograms and segment
lengths.
"""

from .api import Encoder, ImageBuffer
from .core.errors import (
    AppSegmentTooLarge,
    BadImageData,
    DimensionsTooLarge,
    EncodingError,
    IccTooLarge,
    InvalidAppSegment,
    WriteError,
    ZeroImageDimensions,
)
from .core.tables import QUANT_PRESET_NAMES, ZIGZAG
from .core.types import (
    ColorType,
    JpegColorType,
    PixelDensity,
    PixelDensityUnit,
    QuantizationTableType,
    SamplingFactor,
)
from .kernels.fdct import fdct_blocks  # benchmark surface (lib.rs:51-52)

__version__ = "0.1.0"


def enable_persistent_cache(path=None):
    """Enable JAX's persistent compilation cache so the fused encode
    programs (which are large) compile once per (shape, config) across
    processes.  Called automatically on import unless TPUENC_JAX_CACHE=0."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "TPUENC_JAX_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "tpuenc-jax"),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


import os as _os

if _os.environ.get("TPUENC_JAX_CACHE", "1") != "0":
    enable_persistent_cache()
del _os

__all__ = [
    "Encoder",
    "ImageBuffer",
    "ColorType",
    "JpegColorType",
    "SamplingFactor",
    "PixelDensity",
    "PixelDensityUnit",
    "EncodingError",
    "InvalidAppSegment",
    "AppSegmentTooLarge",
    "IccTooLarge",
    "BadImageData",
    "DimensionsTooLarge",
    "ZeroImageDimensions",
    "WriteError",
    "QuantizationTableType",
    "QUANT_PRESET_NAMES",
    "ZIGZAG",
    "fdct_blocks",
    "rgb_to_ycbcr",
    "cmyk_to_ycck",
]


def rgb_to_ycbcr(r: int, g: int, b: int):
    """Scalar exact fixed-point RGB->YCbCr (reference image_buffer.rs:9-31)."""
    y = 19595 * r + 38470 * g + 7471 * b
    cb = -11059 * r - 21709 * g + 32768 * b + (128 << 16)
    cr = 32768 * r - 27439 * g - 5329 * b + (128 << 16)
    return ((y + 0x7FFF) >> 16, (cb + 0x7FFF) >> 16, (cr + 0x7FFF) >> 16)


def cmyk_to_ycck(c: int, m: int, y: int, k: int):
    """Scalar CMYK->YCCK (reference image_buffer.rs:35-38)."""
    yy, cb, cr = rgb_to_ycbcr(c, m, y)
    return (yy, cb, cr, 255 - k)
