from .dedup import (ConnectedComponents, ExactDeduplicator,
                    MinHashLSHDeduplicator, MinHashSignature,
                    NGramJaccardDeduplicator, SimHashDeduplicator)
from .multimodal import (ImageResizer, MediaFeatureExtractor,
                         VideoFrameSampler)
from .simsearch import (BruteForceKNNJoin, EmbeddingCosineDeduplicator,
                        IVFIndex, IVFIndexModel, RandomHyperplaneLSH,
                        RandomHyperplaneLSHModel)
from .textanalysis import (DocumentFingerprinter, LanguageIdentifier,
                           TextQualityScorer, TokenCounter)

__all__ = [n for n in dir() if not n.startswith("_")]
