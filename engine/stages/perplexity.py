"""From-scratch KenLM-style n-gram perplexity scorer (actor-pool stage).

A byte-bigram language model with additive smoothing, counts built
offline and deterministically from the synthetic template corpus (kenlm is
not installed; pure NumPy). Per-doc perplexity
``ppl = exp(-mean log P(b_i | b_{i-1}))`` feeds the ``high_perplexity``
verdict rule — the reference's threshold→status banding applied to a score
(reference: src/checker/null_checker.py:97-102; statistical-outlier check
checks/check_range.sql:113-131).

The conditional log-prob table is a flat (65536,) float32 array —
``logp[prev*256 + cur]`` — so scoring is one vectorized gather + segment
mean per batch (see textfeat.py). Cross-doc bigrams are masked, making
scores independent of batch boundaries and parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .textfeat import byte_view, gram_ids_bigram, per_doc_gram_scores

_VOCAB = 256
_ALPHA = 0.1


@dataclass
class NGramLM:
    logp: np.ndarray  # (65536,) float32: log P(cur | prev)

    def ppl_arrays(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        ids, valid = gram_ids_bigram(data, offsets)
        sums, n_valid = per_doc_gram_scores(self.logp, ids, valid, offsets)
        nll = -sums / np.maximum(n_valid, 1)
        ppl = np.exp(nll)
        # docs with <2 bytes have no bigrams: define ppl = 0 (they are
        # handled by the empty/too_short rules, never the ppl rule)
        return np.where(n_valid > 0, ppl, 0.0)


def train_lm(texts: list[str]) -> NGramLM:
    """Additively-smoothed bigram LM from training texts (deterministic)."""
    counts = np.zeros(_VOCAB * _VOCAB, dtype=np.float64)
    arr = pa.array(texts, pa.large_string())
    data, offsets = byte_view(arr)
    ids, valid = gram_ids_bigram(data, offsets)
    np.add.at(counts, ids[valid], 1.0)
    ctx_totals = counts.reshape(_VOCAB, _VOCAB).sum(axis=1)
    logp = np.log(
        (counts.reshape(_VOCAB, _VOCAB) + _ALPHA)
        / (ctx_totals[:, None] + _ALPHA * _VOCAB)
    )
    return NGramLM(logp=logp.reshape(-1).astype(np.float32))


class PerplexityScorer:
    """Actor-pool map_batches stage: appends ``ppl`` (float64)."""

    def __init__(self, lm: NGramLM, content_col: str = "content"):
        self.lm = lm
        self.content_col = content_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_view(batch[self.content_col])
        ppl = self.lm.ppl_arrays(data, offsets)
        return batch.append_column("ppl", pa.array(ppl, pa.float64()))
