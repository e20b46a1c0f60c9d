"""Security estimator sanity: external anchors + shipped-chain floors.

The estimator (moai_tpu/security.py) is a primal-uSVP core-SVP model;
these tests pin it against public anchor points so a silent regression in
the math is caught (VERDICT r4 weak #4)."""

import math

from moai_tpu.security import primal_usvp_beta, security_bits
from moai_tpu.params import (_approx_security_bits, flagship_config,
                             flagship_parity_config, bench_config_n15)


def test_kyber512_anchor():
    # Kyber512 primal blocksize is publicly ~400-405 (core-SVP 2^118);
    # our simplified GSA model should land within ~8%.
    beta = primal_usvp_beta(512, math.log2(3329), sigma=1.224)
    assert 360 <= beta <= 430, beta


def test_he_standard_rows_monotone():
    # HE-standard 128-bit rows (uniform ternary): the pure core-SVP
    # exponent of those rows is known to sit below the headline 128 (the
    # tables include non-core-SVP overheads); expect a consistent band.
    rows = [(1024, 27), (4096, 109), (16384, 438), (32768, 881)]
    bits = [security_bits(n, lq) for n, lq in rows]
    assert all(85 <= b <= 115 for b in bits), bits


def test_more_modulus_less_security():
    a = security_bits(32768, 800, hamming_weight=192)
    b = security_bits(32768, 1600, hamming_weight=192)
    assert a > b


def test_sparse_secret_weaker_than_uniform():
    u = security_bits(32768, 881)
    s = security_bits(32768, 881, hamming_weight=64)
    assert s < u


def test_shipped_chain_floors():
    assert _approx_security_bits(flagship_config()) >= 55.0
    assert _approx_security_bits(flagship_parity_config()) >= 70.0
    assert _approx_security_bits(bench_config_n15()) >= 35.0
