from .mesh import MeshRuntime, best_mesh_shape
from .prng import KeySeq

__all__ = ["MeshRuntime", "best_mesh_shape", "KeySeq"]
