"""Host-side text processing: tokenization, stopwords, stemming."""

from bm25_tpu.text.stopwords import STOPWORDS_EN, get_stopwords
from bm25_tpu.text.tokenizer import TokenizedCorpus, Tokenizer, pad_token_lists

__all__ = [
    "STOPWORDS_EN", "get_stopwords",
    "TokenizedCorpus", "Tokenizer", "pad_token_lists",
]
