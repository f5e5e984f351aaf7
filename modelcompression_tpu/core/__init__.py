from modelcompression_tpu.core.precision import Precision, BITMATCH, FAST
from modelcompression_tpu.core.mesh import make_mesh, MeshConfig

__all__ = ["Precision", "BITMATCH", "FAST", "make_mesh", "MeshConfig"]
