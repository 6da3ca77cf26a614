from .gae import compute_gae, discounted_returns
from .pallas_gae import compute_gae_pallas

__all__ = ["compute_gae", "discounted_returns", "compute_gae_pallas"]
