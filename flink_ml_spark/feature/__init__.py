"""Feature engineering stages (reference: flink-ml-lib .../feature/*)."""

from .binarizer import Binarizer
from .bucketizer import Bucketizer
from .countvectorizer import IDF, CountVectorizer, CountVectorizerModel, IDFModel
from .dct import DCT
from .elementwise import (ElementwiseProduct, Interaction, NGram, Normalizer,
                          VectorSlicer)
from .functions import array_to_sparse, array_to_vector, vector_to_array
from .hashingtf import FeatureHasher, HashingTF
from .imputer import Imputer, ImputerModel
from .kbinsdiscretizer import KBinsDiscretizer, KBinsDiscretizerModel
from .minhashlsh import MinHashLSH, MinHashLSHModel
from .onehotencoder import OneHotEncoder, OneHotEncoderModel
from .polynomialexpansion import PolynomialExpansion
from .randomsplitter import RandomSplitter
from .scalers import (MaxAbsScaler, MaxAbsScalerModel, MinMaxScaler,
                      MinMaxScalerModel, RobustScaler, RobustScalerModel,
                      StandardScaler, StandardScalerModel)
from .selectors import (VarianceThresholdSelector,
                        VarianceThresholdSelectorModel, VectorIndexer,
                        VectorIndexerModel)
from .sqltransformer import SQLTransformer
from .stopwordsremover import StopWordsRemover
from .stringindexer import IndexToStringModel, StringIndexer, StringIndexerModel
from .targetencoder import (RareCategoryCollapser,
                            RareCategoryCollapserModel,
                            TargetEncoder, TargetEncoderModel)
from .winsorizer import Winsorizer, WinsorizerModel
from .tokenizer import RegexTokenizer, Tokenizer
from .univariatefeatureselector import (UnivariateFeatureSelector,
                                        UnivariateFeatureSelectorModel)
from .vectorassembler import VectorAssembler

__all__ = [n for n in dir() if not n.startswith("_")]
