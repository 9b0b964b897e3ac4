from .struct import pytree_dataclass, replace, static_field

__all__ = ["pytree_dataclass", "static_field", "replace"]
