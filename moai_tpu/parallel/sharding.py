"""Device-mesh sharding for encrypted tensors.

The reference has NO distributed backend (SURVEY.md §2.4) — its
parallelism is OpenMP threads over ciphertext columns and implicit
RNS-limb loops.  Those two axes become first-class mesh axes here:

- ``col``  — the ciphertext-column batch axis (768 columns / 128
  diagonals): embarrassingly parallel for CPMM/nonlinears, the natural
  data-parallel axis (the OpenMP analog).
- ``limb`` — the RNS-limb axis: dyadic ops are limb-local; NTT stages are
  limb-local too (each limb transforms independently along N), so limb
  sharding is collective-free except base-extension/rescale broadcasts,
  which XLA lowers to all-gathers over ICI.

Ciphertext data layout is [col..., n_polys, limb, N]; shardings are
NamedShardings over a Mesh with axes ("col", "limb").  XLA/GSPMD inserts
the collectives (psum for CPMM contractions over a sharded column axis,
all-gather for rescale's last-limb broadcast) — nothing here issues
explicit collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, limb_axis: int = 1) -> Mesh:
    """Mesh over available devices: ("col", "limb")."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    assert n <= len(devs), (n, len(devs))
    assert n % limb_axis == 0
    arr = np.array(devs[:n]).reshape(n // limb_axis, limb_axis)
    return Mesh(arr, ("col", "limb"))


def ct_sharding(mesh: Mesh, batched: bool = True, limb: bool = False
                ) -> NamedSharding:
    """Sharding for ciphertext data [C, n_polys, L, N] (batched) or
    [n_polys, L, N]."""
    col = "col" if batched else None
    lmb = "limb" if limb else None
    spec = P(col, None, lmb, None) if batched else P(None, lmb, None)
    return NamedSharding(mesh, spec)


def shard_ciphertext(ct, mesh: Mesh, limb: bool = False):
    """Place a Ciphertext's data on the mesh (batched leading col axis)."""
    from ..ciphertext import Ciphertext
    batched = ct.data.ndim > 3
    s = ct_sharding(mesh, batched=batched, limb=limb)
    return Ciphertext(jax.device_put(ct.data, s), ct.scale, ct.is_ntt)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
