"""SHA256 / Merkle gadgets (gadgetlib1/gadgets/hashes/sha256 +
merkle_tree parity): the host compression mirrors hashlib exactly, the
R1CS gadget mirrors the host compression, and every constraint is
satisfied by the generated witness."""

import hashlib
import struct

import pytest

from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.gadgets.sha256_gadget import (
    IV,
    Sha256CompressionGadget,
    Sha256TwoToOneGadget,
    Word,
    host_compress,
    host_two_to_one,
)
from snark_challenge_prover_tpu.models.primes import P_MNT4_R


def _words(data: bytes):
    return list(struct.unpack(">16I", data))


def test_host_compress_matches_hashlib():
    """sha256(64-byte msg) = compress(compress(IV, msg), padding)."""
    msg = bytes(range(64))
    h1 = host_compress(IV, _words(msg))
    pad = b"\x80" + b"\x00" * 55 + struct.pack(">Q", 512)
    h2 = host_compress(h1, _words(pad))
    want = hashlib.sha256(msg).digest()
    assert struct.pack(">8I", *h2) == want


def test_compression_gadget_matches_host(rng):
    pb = Protoboard(P_MNT4_R)
    state = [Word.allocate(pb, f"s{i}") for i in range(8)]
    block = [Word.allocate(pb, f"m{i}") for i in range(16)]
    for w in state + block:
        w.boolify(pb)
    g = Sha256CompressionGadget(pb, state, block)

    sv = [rng.getrandbits(32) for _ in range(8)]
    bv = [rng.getrandbits(32) for _ in range(16)]
    for w, v in zip(state, sv):
        w.set_value(pb, v)
    for w, v in zip(block, bv):
        w.set_value(pb, v)
    g.generate_r1cs_witness()

    assert g.output_values() == host_compress(sv, bv)
    assert pb.is_satisfied()
    # same order of constraint count as the reference's ~27k
    assert 20000 < pb.num_constraints < 40000


def test_two_to_one_gadget(rng):
    pb = Protoboard(P_MNT4_R)
    left = [Word.allocate(pb, f"l{i}") for i in range(8)]
    right = [Word.allocate(pb, f"r{i}") for i in range(8)]
    for w in left + right:
        w.boolify(pb)
    g = Sha256TwoToOneGadget(pb, left, right)
    lv = [rng.getrandbits(32) for _ in range(8)]
    rv = [rng.getrandbits(32) for _ in range(8)]
    for w, v in zip(left, lv):
        w.set_value(pb, v)
    for w, v in zip(right, rv):
        w.set_value(pb, v)
    g.generate_r1cs_witness()
    assert g.output_values() == host_two_to_one(lv, rv)
    assert pb.is_satisfied()


def test_merkle_auth_path(rng):
    from snark_challenge_prover_tpu.gadgets.merkle_tree import (
        MerkleAuthPathGadget,
        host_merkle_root,
    )

    depth = 3
    pb = Protoboard(P_MNT4_R)
    g = MerkleAuthPathGadget(pb, depth)

    leaf = [rng.getrandbits(32) for _ in range(8)]
    address = rng.randrange(1 << depth)
    path = [[rng.getrandbits(32) for _ in range(8)] for _ in range(depth)]
    root = g.set_witness(leaf, address, path)
    assert root == host_merkle_root(leaf, address, path)
    assert pb.is_satisfied()

    # tamper with one sibling digest -> the proof must no longer verify
    pb2 = Protoboard(P_MNT4_R)
    g2 = MerkleAuthPathGadget(pb2, depth)
    bad_path = [list(lvl) for lvl in path]
    bad_path[1][0] ^= 1
    g2.set_witness(leaf, address, bad_path)
    # root variables were set to the recomputed (wrong) root; force the
    # original root instead: equality constraints must now fail
    for w, v in zip(g2.root, root):
        w.set_value(pb2, v)
    assert not pb2.is_satisfied()
