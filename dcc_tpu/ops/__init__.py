from .gae import compute_gae, discounted_returns

__all__ = ["compute_gae", "discounted_returns"]
