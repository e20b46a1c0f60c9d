"""Test-harness recryption ("cheat bootstrap").

Stand-in for the bootstrapping pipeline while validating the model layers
(SURVEY.md §7.3: the minimum end-to-end slice replaces softmax's single
bootstrap with a harness recrypt).  Unlike the reference — which passes the
secret key *into* op code for debug decrypts (softmax.hpp:309) — this lives
strictly on the harness side and is never importable from ops/models.
"""

from __future__ import annotations

import numpy as np

from ..ciphertext import Ciphertext
from ..encrypt import Encryptor, Decryptor


class Recryptor:
    def __init__(self, encryptor: Encryptor, decryptor: Decryptor):
        self.encryptor = encryptor
        self.decryptor = decryptor

    def recrypt(self, ct: Ciphertext, n_q: int | None = None,
                scale: float | None = None) -> Ciphertext:
        """Decrypt and re-encrypt at (n_q, scale) — emulates bootstrap with
        zero approximation error.  Handles leading batch axes."""
        ctx = self.encryptor.ctx
        n_q = n_q if n_q is not None else ctx.L
        scale = scale if scale is not None else ctx.scale
        vals = self.decryptor.decrypt(ct)
        return self.encryptor.encrypt(
            self.encryptor.encode(vals, scale=scale, n_q=n_q))
