from .core import (
    jaccard,
    likeness_score,
    minhash_signature,
    portable_hash64,
    tokens,
    with_minmax_normalized,
    word_shingles,
)
from .skew import salted_collect_set, salted_join

__all__ = [
    "salted_collect_set",
    "salted_join",
    "jaccard",
    "likeness_score",
    "minhash_signature",
    "portable_hash64",
    "tokens",
    "with_minmax_normalized",
    "word_shingles",
]
