from .star import STAR_CTES, build_star

__all__ = ["build_star", "STAR_CTES"]
