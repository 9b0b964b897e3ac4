from .core import (
    LogNormal,
    Normal,
    Product,
    TruncatedNormal,
    TupleProduct,
    Uniform,
    product_distribution,
)
from .mvnormal import MvNormal

__all__ = [
    "Normal",
    "LogNormal",
    "Uniform",
    "TruncatedNormal",
    "Product",
    "TupleProduct",
    "MvNormal",
    "product_distribution",
]
