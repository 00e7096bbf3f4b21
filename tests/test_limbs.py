"""Bit-exact tests of the limb-plane primitives against Python ints.

Everything runs under jax.jit — eager mode would compile hundreds of tiny
kernels; one fused program per op is both faster and closer to how the
framework is used.
"""

import jax
import jax.numpy as jnp
import numpy as np

from snark_challenge_prover_tpu.ops import limbs as lb
from snark_challenge_prover_tpu.utils.bigint import (
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)

L = 48
N = 16  # fixed batch size to share compilations across tests
MOD = 1 << (16 * L)
MOD96 = 1 << (16 * 96)

_mul_wide_n = jax.jit(lambda a, b: lb.normalize(lb.mul_wide(a, b)))
_mul_low_n = jax.jit(lambda a, b: lb.normalize(lb.mul_low(a, b, L)))
_normalize = jax.jit(lb.normalize)
_sub_borrow = jax.jit(lb.sub_borrow)
_cond_sub = jax.jit(lb.cond_sub)
_mul_small13 = jax.jit(lambda a: lb.normalize(lb.mul_small(a, 13)))


def rand_ints(rng, n=N, bits=753):
    return [rng.getrandbits(bits) for _ in range(n)]


def test_roundtrip(rng):
    xs = rand_ints(rng)
    assert limbs_to_ints(ints_to_limbs(xs)) == xs
    x = rng.getrandbits(760)
    assert limbs_to_int(int_to_limbs(x)) == x


def test_normalize_redundant(rng):
    vals = np.array(
        [[rng.getrandbits(23) for _ in range(N)] for _ in range(96)], dtype=np.uint32
    )
    want = [
        sum(int(vals[i, j]) << (16 * i) for i in range(96)) % MOD96 for j in range(N)
    ]
    got = limbs_to_ints(np.asarray(_normalize(jnp.asarray(vals))))
    assert got == want


def test_carry_ripple():
    # all-0xffff chain plus 1: worst-case carry ripple
    x = np.full((48, N), 0xFFFF, np.uint32)
    x[0, :] += 1
    got = limbs_to_ints(np.asarray(_normalize(jnp.asarray(x))))
    want = [(sum(0xFFFF << (16 * i) for i in range(48)) + 1) % MOD] * N
    assert got == want


def test_mul_wide(rng):
    a, b = rand_ints(rng), rand_ints(rng)
    got = limbs_to_ints(
        np.asarray(_mul_wide_n(jnp.asarray(ints_to_limbs(a)), jnp.asarray(ints_to_limbs(b))))
    )
    assert got == [x * y for x, y in zip(a, b)]


def test_mul_low(rng):
    a, b = rand_ints(rng), rand_ints(rng)
    got = limbs_to_ints(
        np.asarray(_mul_low_n(jnp.asarray(ints_to_limbs(a)), jnp.asarray(ints_to_limbs(b))))
    )
    assert got == [(x * y) % MOD for x, y in zip(a, b)]


def test_sub_borrow_and_ripple(rng):
    a, b = rand_ints(rng), rand_ints(rng)
    # adversarial borrow-ripple cases appended
    a[:4] = [(1 << 768) - 1, 0, 12345, 1 << 767]
    b[:4] = [0, 1, 12345, (1 << 767) - 1]
    A, B = jnp.asarray(ints_to_limbs(a)), jnp.asarray(ints_to_limbs(b))
    d, lt = _sub_borrow(A, B)
    assert limbs_to_ints(np.asarray(d)) == [(x - y) % MOD for x, y in zip(a, b)]
    assert list(np.asarray(lt)) == [x < y for x, y in zip(a, b)]


def test_mul_small(rng):
    a = rand_ints(rng, bits=756)
    got = limbs_to_ints(np.asarray(_mul_small13(jnp.asarray(ints_to_limbs(a)))))
    assert got == [(x * 13) % MOD for x in a]


def test_cond_sub(rng):
    m = rng.getrandbits(753) | (1 << 752)
    a = [rng.randrange(0, 2 * m) for _ in range(N)]
    a[0] = m  # boundary: exactly m -> 0
    a[1] = m - 1
    A = jnp.asarray(ints_to_limbs(a))
    M = jnp.asarray(int_to_limbs(m))
    got = limbs_to_ints(np.asarray(_cond_sub(A, M)))
    assert got == [x - m if x >= m else x for x in a]
