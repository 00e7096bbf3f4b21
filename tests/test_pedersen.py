"""Pedersen hash + Schnorr demo (pedersen.py; misc/pedersen.cpp parity):
sign/verify round-trip, tamper rejection, and the device batched-MSM
hash path vs the host loop.
"""

import random

import pytest

from snark_challenge_prover_tpu.pedersen import PedersenSchnorr, hash_batch_device


@pytest.fixture(scope="module")
def ped():
    return PedersenSchnorr("MNT4753", random.Random(7), max_input_size=1600)


def test_sign_verify_roundtrip(ped):
    sk, pk = ped.keygen()
    msg = [random.Random(1).random() < 0.5 for _ in range(64)]
    sig = ped.sign(sk, msg)
    assert ped.verify(pk, msg, sig)


def test_wrong_message_rejected(ped):
    sk, pk = ped.keygen()
    msg = [True, False] * 16
    sig = ped.sign(sk, msg)
    bad = list(msg)
    bad[3] = not bad[3]
    assert not ped.verify(pk, bad, sig)


def test_wrong_key_rejected(ped):
    sk, pk = ped.keygen()
    _, pk2 = ped.keygen()
    msg = [False, True] * 8
    sig = ped.sign(sk, msg)
    assert not ped.verify(pk2, msg, sig)


@pytest.mark.skipif(
    __import__("os").environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="device MSM compile is heavy on XLA:CPU; gated",
)
def test_device_hash_matches_host(ped):
    rng = random.Random(3)
    M, N = 2, 16
    bits = [[rng.randrange(2) for _ in range(N)] for _ in range(M)]
    got = hash_batch_device("MNT4753", ped.coeffs[:N], bits)
    for m in range(M):
        want, _ = ped.hash_bits([bool(b) for b in bits[m]])
        assert got[m] == want
