from ..classification.linear import LinearRegression, LinearRegressionModel
from .conformal import ConformalRegressor, ConformalRegressorModel
from .isotonic import IsotonicRegression, IsotonicRegressionModel

__all__ = ["LinearRegression", "LinearRegressionModel",
           "ConformalRegressor", "ConformalRegressorModel",
           "IsotonicRegression", "IsotonicRegressionModel"]
