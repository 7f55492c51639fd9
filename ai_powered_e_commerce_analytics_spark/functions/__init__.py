from .core import (
    jaccard,
    likeness_score,
    minhash_signature,
    portable_hash64,
    tokens,
    with_minmax_normalized,
    word_shingles,
)

__all__ = [
    "jaccard",
    "likeness_score",
    "minhash_signature",
    "portable_hash64",
    "tokens",
    "with_minmax_normalized",
    "word_shingles",
]
