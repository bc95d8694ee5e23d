from .aggregates import davg, dstddev, dsum

__all__ = ["dsum", "davg", "dstddev"]
