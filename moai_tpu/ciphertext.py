"""Ciphertext/Plaintext containers — jnp pytrees with static metadata.

TPU-native counterpart of SEAL's Ciphertext/Plaintext buffer classes
(reference: thirdparty/SEAL-4.1-bs/native/src/seal/ciphertext.h,
plaintext.h).  Data is a single uint32 array in Montgomery form:

    Ciphertext.data: [..., n_polys, n_q, N]
    Plaintext.data:  [..., n_q, N]

Leading batch dimensions are first-class: the reference's per-column
``vector<Ciphertext>`` + OpenMP loops (e.g. Ct_pt_matrix_mul.hpp:19)
become one batched array here.  ``scale`` (exact float, like SEAL's
double scale) and ``is_ntt`` are static aux data, so level/scale
mismatches surface at trace time instead of runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Ciphertext:
    data: jax.Array                                   # [..., n_polys, n_q, N]
    scale: float = dataclasses.field(metadata=dict(static=True))
    is_ntt: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def n_polys(self) -> int:
        return self.data.shape[-3]

    @property
    def n_q(self) -> int:
        return self.data.shape[-2]

    @property
    def N(self) -> int:
        return self.data.shape[-1]

    @property
    def batch_shape(self):
        return self.data.shape[:-3]

    def with_data(self, data) -> "Ciphertext":
        return Ciphertext(data, self.scale, self.is_ntt)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Plaintext:
    data: jax.Array                                   # [..., n_q, N]
    scale: float = dataclasses.field(metadata=dict(static=True))
    is_ntt: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def n_q(self) -> int:
        return self.data.shape[-2]

    @property
    def N(self) -> int:
        return self.data.shape[-1]
