from . import meshio_native

__all__ = ["meshio_native"]
