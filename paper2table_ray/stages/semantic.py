"""Deterministic semantic-similarity backend.

The reference loads spaCy word-vector models per worker for column
alignment, column splitting and mojibake detection
(/root/reference/src/tablemerge/spacy_utils.py:9-11, analyzers.py:227-230,
fragment_transformer.py:207-210, 328). spaCy models aren't available in this
sandbox and wouldn't be reproducible across environments, so we substitute a
**deterministic hashed character-n-gram embedding** behind the same protocol
(``vector``, ``similarity``, ``has_vector``, ``is_known_word``). Real spaCy
backends can drop in by implementing the same three methods.

This is intentionally per-worker state: in Ray Data it is hosted inside
actor-pool ``map_batches`` classes whose ``__init__`` constructs one
``NgramVectorizer`` (SURVEY.md §2.3 ST1).
"""

from __future__ import annotations

import hashlib
import math
import re
from functools import lru_cache

import numpy as np

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# Small bilingual common-word list used for the "known word" test of the
# mojibake FragmentValuesReverser (reference: spaCy vocab has_vector,
# fragment_transformer.py:333-338). Deterministic + hermetic.
KNOWN_WORDS = frozenset(
    """
    the and of a to in is was for on with as by that from at an are were this
    species name common family genus table data value total number page study
    plant animal bird flower tree seed leaf root north south east west
    population distribution level endangered vulnerable stable rare
    sunflower rose tulip daisy orchid maple oak pine fern moss
    el la los las de del y en es un una para con por que se al
    especie nombre comun familia genero tabla datos valor numero
    planta animal ave flor arbol semilla hoja raiz norte sur este oeste
    very long word words text content main article section heading paragraph
    """.split()
)


class NgramVectorizer:
    """Hashed char-3-gram embedding with cosine similarity.

    Deterministic: ngram → sha1 → bucket in a fixed-dimension float vector.
    Word boundaries padded so short words still get signal.
    """

    def __init__(self, dim: int = 128):
        self.dim = dim
        # cache per-instance so actor reuse amortizes hashing
        self._vector_cached = lru_cache(maxsize=65536)(self._vector_uncached)

    def _vector_uncached(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float64)
        for word in _WORD_RE.findall(text.lower()):
            padded = f"^{word}$"
            for i in range(len(padded) - 2):
                gram = padded[i : i + 3]
                h = int.from_bytes(
                    hashlib.sha1(gram.encode("utf-8")).digest()[:8], "little"
                )
                vec[h % self.dim] += 1.0 if (h >> 63) & 1 == 0 else -1.0
        norm = math.sqrt(float(vec @ vec))
        if norm > 0:
            vec /= norm
        return vec

    def vector(self, text: str) -> np.ndarray:
        return self._vector_cached(text)

    def has_vector(self, text: str) -> bool:
        return bool(_WORD_RE.search(text))

    def similarity(self, a: str, b: str) -> float:
        if not self.has_vector(a) or not self.has_vector(b):
            return 0.0
        return float(self.vector(a) @ self.vector(b))

    @staticmethod
    def is_known_word(word: str) -> bool:
        return word.lower() in KNOWN_WORDS
