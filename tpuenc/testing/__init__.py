"""Verification tooling shipped with the framework: an independent JPEG
decoder used by the test suite to break the encoder's self-referential
parity loop (the analog of the reference's ``jpeg-decoder`` dev-dependency,
``/root/reference/Cargo.toml:24-25``)."""

from .decoder import (  # noqa: F401
    DecodedComponent,
    DecodedImage,
    JpegDecodeError,
    decode_coefficients,
)
