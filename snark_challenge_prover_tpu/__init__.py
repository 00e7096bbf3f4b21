"""snark_challenge_prover_tpu — a TPU-native Groth16 prover framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MinaProtocol/snark-challenge-prover-reference (the 2019 SNARK-challenge
Groth16 prover for the MNT4753/MNT6753 curve cycle):

  * 753-bit prime-field arithmetic in Montgomery form, vectorized as
    16-bit limb planes over the TPU VPU (ops/limbs.py, ops/field.py).
  * Extension-field towers Fq2/Fq3 (+ Fq4/Fq6 for pairings) (ops/towers.py).
  * Branch-free projective short-Weierstrass group law for G1/G2
    (ops/group.py).
  * Radix-2 (and mixed-radix) evaluation domains: FFT/iFFT/cosetFFT/
    divide-by-Z (ops/fft.py).
  * TPU-shaped Pippenger multi-scalar multiplication (ops/msm.py).
  * The Groth16 challenge prover pipeline, keygen, full blinded prover
    and verifier (proof_systems/groth16.py).
  * The challenge's raw Montgomery byte serialization (io/serialization.py).
  * Multi-chip sharding of MSM and FFT over a jax.sharding.Mesh
    (parallel/).

Reference parity citations point into the upstream C++ tree as
`<file>:<line>` (e.g. libsnark/main.cpp:105).
"""

__version__ = "0.1.0"
