from .mssvt import MixedScaleSparseTransformer

__all__ = {
    "MixedScaleSparseTransformer": MixedScaleSparseTransformer,
}
