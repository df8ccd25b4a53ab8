from .detector import Detector
from .adapter import CompInvEncoder

__all__ = ["Detector", "CompInvEncoder"]
