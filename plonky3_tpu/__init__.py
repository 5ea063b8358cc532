"""plonky3_tpu — a TPU-native STARK-primitive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Plonky3
(reference: /root/reference, a Rust workspace of ~45 crates). The compute
path is jnp/Pallas over `uint32` lanes; the host path (Fiat-Shamir
transcript, verifier) is exact Python integer arithmetic.

Layer map (mirrors SURVEY.md §1):
  fields/     — prime fields (Monty-31, Mersenne-31) + binomial extensions
  utils/      — bit tricks, transposes
  ops/        — NTT / coset LDE / bit-reversal kernels
  hashes/     — Poseidon2 & friends as batched device kernels + host impls
  merkle/     — multi-matrix Merkle tree (MMCS)
  challenger/ — Fiat-Shamir transcripts (host side)
  commit/     — polynomial-space/domain abstraction
  fri/        — FRI low-degree test + TwoAdicFriPcs
  air/        — AIR builder DSL, symbolic degree analysis
  stark/      — uni-stark prove/verify
  models/     — AIR gadgets / proof workloads (fibonacci, poseidon2-air, ...)
  parallel/   — device-mesh sharding (multi-chip NTT, sharded Merkle)
"""

__version__ = "0.1.0"
