from .funk_svd import FunkSVD
from .als import ALS

__all__ = ["FunkSVD", "ALS"]
