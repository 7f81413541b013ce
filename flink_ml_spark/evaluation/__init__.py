from .binaryclassification import BinaryClassificationEvaluator

__all__ = ["BinaryClassificationEvaluator"]
