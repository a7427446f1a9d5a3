"""Field-layer tests: Modulus constants and host Barrett semantics.

Mirrors the implicit invariants of modular_arith.cuh:28-156.
"""

import random

import numpy as np
import pytest

from gpuntt_tpu import Modulus32, Modulus64, OPERATOR
from gpuntt_tpu.arith.host import barrett_mult


def test_modulus_constants_u32():
    m = Modulus32(469762049)
    assert m.bit == 29
    assert m.mu == (1 << (2 * 29 + 1)) // 469762049


def test_modulus_constants_u64():
    m = Modulus64(576460756061519873)
    assert m.bit == 60
    assert m.mu == (1 << (2 * 60 + 1)) // 576460756061519873


@pytest.mark.parametrize(
    "mod",
    [
        Modulus32(469762049),
        Modulus32(268460033),
        Modulus64(576460756061519873),
        Modulus64(288230385815388161),
    ],
)
def test_barrett_mult_exact(mod):
    """The reference's bit-2/bit+3 Barrett schedule is an exact modmul."""
    rnd = random.Random(0)
    for _ in range(2000):
        a = rnd.randrange(mod.value)
        b = rnd.randrange(mod.value)
        assert barrett_mult(a, b, mod) == (a * b) % mod.value


def test_host_ops():
    m = Modulus32(469762049)
    q = m.value
    rnd = random.Random(1)
    for _ in range(200):
        a = rnd.randrange(q)
        b = rnd.randrange(q)
        assert OPERATOR.add(a, b, m) == (a + b) % q
        assert OPERATOR.sub(a, b, m) == (a - b) % q
        assert OPERATOR.mult(a, b, m) == (a * b) % q
    assert OPERATOR.modinv(12345, m) == pow(12345, q - 2, q)
    assert OPERATOR.exp(3, 1000, m) == pow(3, 1000, q)


def test_signed_and_centered():
    m = Modulus32(469762049)
    assert OPERATOR.reduce_signed(-5, m) == m.value - 5
    assert OPERATOR.reduce_signed(7, m) == 7
    assert OPERATOR.centered_reduction(m.value - 3, m) == -3
    assert OPERATOR.centered_reduction(5, m) == 5
    half = m.value >> 1
    assert OPERATOR.centered_reduction(half, m) == half  # input > half only
    assert OPERATOR.centered_reduction(half + 1, m) == half + 1 - m.value
