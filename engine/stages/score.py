"""Fused scoring stage: metrics + sha256 + langid + perplexity in ONE
actor-pool map_batches pass.

Why fused: each hop between map_batches operators serializes the whole
block through the object store; metrics, the langid scorer and the LM
scorer all need the same byte/offset view of ``content``, and the LM
consumes the same bigram ids the langid features start from. One stage =
one byte_view, one shared bigram featurization, one block hop.

Reference analogue: the reference runs its checkers sequentially over the
same table with one SQL round-trip each (src/main.py:117-152); this is
the column-at-a-time fusion of that loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .heuristics import add_metrics
from .langid import LangIdModel, gram_ids_quadgram, gram_ids_trigram
from .perplexity import NGramLM
from .textfeat import byte_view, gram_ids_bigram, per_doc_gram_scores


class ScoreStage:
    """Actor-pool stage appending n_chars/n_lines/max_line_len/alpha_ratio,
    content_sha256_pre, lang_pred, lang_conf, ppl.

    Models are built once on the driver and shipped via
    ``fn_constructor_kwargs`` (one object-store copy, deserialized once per
    actor in ``__init__`` — never per batch).
    """

    def __init__(self, langid: LangIdModel, lm: NGramLM, content_col: str = "content"):
        self.langid = langid
        self.lm = lm
        self.classes = np.array(langid.classes, dtype=object)
        self.content_col = content_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_metrics(batch, content_col=self.content_col)
        data, offsets = byte_view(batch[self.content_col])

        big_ids, big_valid = gram_ids_bigram(data, offsets)
        tri_ids, tri_valid = gram_ids_trigram(data, offsets)
        quad_ids, quad_valid = gram_ids_quadgram(data, offsets)

        # langid: NB score = sum of per-gram log-likelihoods over all 3 sets
        w = self.langid.weights
        s1, n1 = per_doc_gram_scores(w, big_ids, big_valid, offsets)
        s2, n2 = per_doc_gram_scores(w, tri_ids, tri_valid, offsets)
        s3, n3 = per_doc_gram_scores(w, quad_ids, quad_valid, offsets)
        sums = s1 + s2 + s3
        n_valid = n1 + n2 + n3
        logp = sums / np.maximum(n_valid, 1)[:, None] + self.langid.priors[None, :] / 100.0
        pred = np.argmax(logp, axis=1)
        z = logp * 20.0
        z = z - z.max(axis=1, keepdims=True)
        ez = np.exp(z)
        conf = ez[np.arange(len(pred)), pred] / ez.sum(axis=1)
        conf = np.where(n_valid > 0, conf, 0.0)

        # perplexity reuses the SAME bigram ids (no re-featurization)
        lsum, ln = per_doc_gram_scores(self.lm.logp, big_ids, big_valid, offsets)
        nll = -lsum / np.maximum(ln, 1)
        ppl = np.where(ln > 0, np.exp(nll), 0.0)

        return (
            batch.append_column("lang_pred", pa.array(self.classes[pred], pa.string()))
            .append_column("lang_conf", pa.array(conf, pa.float64()))
            .append_column("ppl", pa.array(ppl, pa.float64()))
        )
