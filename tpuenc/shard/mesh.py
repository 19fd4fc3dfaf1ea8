"""Device mesh helpers.

The reference is strictly single-process (SURVEY §2: empty dependency set,
no threads); its only parallelism seams are restart intervals and per-block
independence.  The TPU build elevates these into first-class mesh axes:

* ``batch``  — data parallelism over images (the production serving axis).
* ``stripe`` — MCU-row-stripe parallelism within one large image (the
  "sequence parallel" analog; DC prediction chains are cut at restart
  boundaries so stripes need no halo exchange at all).

Only histograms (psum) and boundary DC predictors / bitstream lengths
(ppermute / all_gather) ever cross the ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    batch: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('batch', 'stripe') mesh over the first ``n_devices``.

    ``batch`` devices are assigned to the image-batch axis; the remainder
    stripe each image.  batch=1 gives pure stripe parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % batch != 0:
        raise ValueError(f"{n_devices} devices not divisible by batch={batch}")
    grid = devices.reshape(batch, n_devices // batch)
    return Mesh(grid, axis_names=("batch", "stripe"))


def stripe_counts(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape["batch"], mesh.shape["stripe"]
