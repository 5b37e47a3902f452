"""Deterministic model building for the scorer stages.

Training corpus = clean template files from the same generator as the
synthetic corpus (engine/corpus.py), drawn from a *disjoint* seed space so
training rows never coincide with evaluation rows. Build once on the
driver; ship the arrays to scorer actors via ``fn_constructor_kwargs``
(object store — one copy per node, not per batch).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..corpus import GLOBAL_SEED, LANGS, make_clean_content
from .langid import LangIdModel, train_langid
from .perplexity import NGramLM, train_lm

_TRAIN_SEED_BASE = GLOBAL_SEED * 2_000_003


def training_texts(n_per_lang: int = 300) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for li, lang in enumerate(LANGS):
        texts = []
        for k in range(n_per_lang):
            rng = np.random.Generator(
                np.random.PCG64(_TRAIN_SEED_BASE + li * 1_000_000 + k)
            )
            texts.append(make_clean_content(lang, rng))
        out[lang] = texts
    return out


@lru_cache(maxsize=1)
def build_models(n_per_lang: int = 300) -> tuple[LangIdModel, NGramLM]:
    """(langid, lm) — deterministic; cached per process."""
    texts = training_texts(n_per_lang)
    langid = train_langid(texts)
    all_texts = [t for lang in sorted(texts) for t in texts[lang]]
    lm = train_lm(all_texts)
    return langid, lm
