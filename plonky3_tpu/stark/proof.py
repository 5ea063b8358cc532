"""uni-stark proof objects (uni-stark/src/proof.rs shapes)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Commitments:
    trace: tuple  # digest (8 standard ints)
    quotient_chunks: tuple


@dataclass
class OpenedValues:
    trace_local: list  # [ext tuple] per trace column
    trace_next: list
    quotient_chunks: list  # [chunk] -> [ext tuple] per flattened column


@dataclass
class Proof:
    commitments: Commitments
    opened_values: OpenedValues
    opening_proof: object  # FriProof
    degree_bits: int
