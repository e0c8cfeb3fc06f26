"""Datasets: wikitext2 (strided causal LM), GLUE, LRA."""

from .wikitext2 import WindowedCorpus, get_corpus, synthetic_corpus

__all__ = ["WindowedCorpus", "get_corpus", "synthetic_corpus"]
