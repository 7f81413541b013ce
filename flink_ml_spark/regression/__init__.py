from ..classification.linear import LinearRegression, LinearRegressionModel
from .isotonic import IsotonicRegression, IsotonicRegressionModel

__all__ = ["LinearRegression", "LinearRegressionModel",
           "IsotonicRegression", "IsotonicRegressionModel"]
