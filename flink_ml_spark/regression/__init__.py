from ..classification.linear import (HuberRegressor, LinearRegression,
                                     LinearRegressionModel,
                                     QuantileRegressor)
from .conformal import ConformalRegressor, ConformalRegressorModel
from .isotonic import IsotonicRegression, IsotonicRegressionModel
from .platt import PlattCalibrator, PlattCalibratorModel
from .forest import RandomForestRegressor, RandomForestRegressorModel
from .gbt import GBTRegressor, GBTRegressorModel
from .tree import (DecisionTreeClassifier, DecisionTreeClassifierModel,
                   DecisionTreeRegressor, DecisionTreeRegressorModel)

__all__ = ["LinearRegression", "LinearRegressionModel",
           "QuantileRegressor", "HuberRegressor",
           "ConformalRegressor", "ConformalRegressorModel",
           "IsotonicRegression", "IsotonicRegressionModel",
           "PlattCalibrator", "PlattCalibratorModel",
           "DecisionTreeRegressor", "DecisionTreeRegressorModel",
           "GBTRegressor", "GBTRegressorModel",
           "DecisionTreeClassifier", "DecisionTreeClassifierModel",
           "RandomForestRegressor", "RandomForestRegressorModel"]
