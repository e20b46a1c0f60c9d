"""Observability: per-op level/scale tracing + per-stage wall timers.

The reference's de-facto debugging instruments are the modulus-chain-index
prints after every stage and gettimeofday pairs around each block
(reference: test_full_scheme.hpp:509-556, single_att_block.hpp:93-95).
Equivalents here:

- ``OpTrace``: attach to ``Evaluator.debug`` — records every evaluator op
  with the result's (n_q, scale) at *trace* time, so a level/scale budget
  mismatch is visible before any device work runs.
- ``StageTimer``: wall-clock stage timing with optional ciphertext
  metadata, for drivers/benches (prints reference-style lines and
  accumulates a dict for JSON output).
- ``NoiseProbe``: harness-side decrypt hook estimating the noise floor of
  a ciphertext against an expected slot vector (the reference does this
  with secret-key prints inside op code, softmax.hpp:472-502; here it
  stays strictly on the harness side).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np


class OpTrace:
    """Evaluator.debug hook: records (op, n_q, scale) per op call.

    with_print=True emits one line per op (the reference's chain-index
    print analog).  ``summary()`` aggregates op counts.
    """

    def __init__(self, with_print: bool = False, log2_scale: bool = True):
        self.events: list[tuple[str, int, float]] = []
        self.with_print = with_print
        self.log2_scale = log2_scale

    def __call__(self, op: str, ct) -> None:
        scale = float(ct.scale)
        self.events.append((op, ct.n_q, scale))
        if self.with_print:
            s = np.log2(scale) if self.log2_scale else scale
            print(f"[moai] {op:<18} n_q={ct.n_q:<3} "
                  f"log2(scale)={s:.3f}")

    def summary(self) -> dict:
        counts: dict[str, int] = {}
        for op, *_ in self.events:
            counts[op] = counts.get(op, 0) + 1
        return counts

    def min_n_q(self) -> int:
        return min((n for _, n, _ in self.events), default=0)


class StageTimer:
    """Reference-style per-stage timing: ``with timer("softmax"): ...``.

    Blocks on the stage's output (pass it via ``set_result``) so device
    work is attributed to the right stage despite async dispatch.
    """

    def __init__(self, verbose: bool = True):
        self.stages: dict[str, float] = {}
        self.verbose = verbose
        self._name: Optional[str] = None
        self._t0 = 0.0

    def __call__(self, name: str) -> "StageTimer":
        self._name = name
        return self

    def __enter__(self) -> "StageTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        name = self._name or f"stage{len(self.stages)}"
        self.stages[name] = self.stages.get(name, 0.0) + dt
        if self.verbose:
            print(f"[moai] {name:<28} {dt:8.3f} s")

    def block(self, ct) -> None:
        """Block on a ciphertext/array so the stage absorbs its device time."""
        data = getattr(ct, "data", ct)
        data.block_until_ready()

    def total(self) -> float:
        return sum(self.stages.values())

    def as_dict(self) -> dict:
        return {k: round(v, 4) for k, v in self.stages.items()}


class NoiseProbe:
    """Harness-side decrypt oracle: max |decrypt(ct) - expected| per probe.

    Strictly client-side (takes a Decryptor) — the security-hygiene fix
    for the reference's secret-key debug prints inside op code
    (softmax.hpp:309, SURVEY.md §5)."""

    def __init__(self, decryptor, verbose: bool = True):
        self.decryptor = decryptor
        self.verbose = verbose
        self.probes: list[tuple[str, float]] = []

    def __call__(self, name: str, ct, expected=None) -> float:
        got = self.decryptor.decrypt(ct)
        if expected is None:
            err = float(np.max(np.abs(got.imag)))
        else:
            err = float(np.max(np.abs(got.real - np.asarray(expected))))
        self.probes.append((name, err))
        if self.verbose:
            print(f"[moai] probe {name:<22} max_err={err:.3e} "
                  f"n_q={ct.n_q}")
        return err
