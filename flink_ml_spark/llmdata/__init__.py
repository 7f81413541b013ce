from .dedup import (ConnectedComponents, ContaminationScorer,
                    Decontaminator,
                    DuplicateResolver,
                    DuplicateSpanDetector, DuplicateSpanRemover,
                    ExactDeduplicator,
                    IncrementalMinHashDeduplicator, LineDeduplicator,
                    MinHashLSHDeduplicator, MinHashSignature,
                    NGramJaccardDeduplicator, SimHashDeduplicator,
                    SnapshotDiff)
from .bloom import DigestBloomFilter, DigestBloomFilterModel
from .bpe import BpeTokenizerModel, BpeTokenizerTrainer
from .profiler import (ConstraintGate, ConstraintSuggester,
                       CorpusDatasheet, DataProfiler,
                       DiversityProfiler,
                       KeySkewProfiler, PsiDrift, VocabGrowthProfiler,
                       FrequentItemsProfiler, suggest_constraints)
from .multimodal import (GifFrameSampler, ImageResizer,
                         MediaFeatureExtractor, VideoFrameSampler)
from .simsearch import (BruteForceKNNJoin, EmbeddingCosineDeduplicator,
                        EmbeddingDriftProfiler,
                        EmbeddingQuantizer, IVFIndex, IVFIndexModel,
                        PCAWhitener, PCAWhitenerModel,
                        HardNegativeMiner,
                        RandomHyperplaneLSH, RandomHyperplaneLSHModel,
                        SemanticDeduplicator)
from .sampling import (CorpusShuffler, DocumentChunker, DomainMixtureSampler,
                       WeightedSampler,
                       ImportanceResampler, ImportanceResamplerModel,
                       NegativeSampler,
                       SequencePacker, StratifiedBudgetSampler,
                       TemperatureMixtureSampler,
                       TemperatureMixtureSamplerModel)
from .fuzzyjoin import FuzzyStringJoin
from .itemsets import FrequentItemsets
from .linkgraph import PageRank
from .webextract import (C4LineFilter, HtmlTextExtractor, UrlNormalizer,
                         WordBlocklistFilter)
from .textanalysis import (BigramLMScorer, BigramLMScorerModel,
                           Bm25Index, Bm25IndexModel, Bm25Retriever,
                           Bm25Scorer, Bm25ScorerModel, CharEntropyScorer,
                           DocumentFingerprinter, GopherQualityFilter,
                           KeynessAnalyzer,
                           LanguageIdentifier, NGramProfiler, PIIRedactor,
                           RepetitionScorer,
                           TextNormalizer, TextQualityScorer, TokenCounter,
                           TokenDriftProfiler,
                           UnigramLMScorer, UnigramLMScorerModel)
from .cooccur import CooccurrenceCounter
from .sketches import (CountMinSketch, CountMinSketchModel,
                       FrequentLineFilter, FrequentLineFilterModel,
                       HyperLogLogSketch, HyperLogLogSketchModel,
                       hll_grouped_registers)

__all__ = [n for n in dir() if not n.startswith("_")]
