from .pcs import CirclePcs, CirclePcsProof

__all__ = ["CirclePcs", "CirclePcsProof"]
