from .datasets import FFPP, CDF, DFDC, RPPG

__all__ = ["FFPP", "CDF", "DFDC", "RPPG"]
