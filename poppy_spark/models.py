"""Real model-shaped plugs for the text model seams.

The text operators (:func:`poppy_spark.spark.text.detect_language`,
:func:`quality_score`, :func:`model_token_count`) accept a
``model_factory`` — a picklable zero-arg callable instantiated ONCE PER
PYTHON WORKER whose result scores Arrow-delivered batches.  The heuristics
are the dependency-free defaults; this module proves the seam contract with
two genuinely *trained* artifacts that need no external libraries:

* :class:`NaiveBayesLangId` — a multinomial naive-Bayes character-trigram
  language classifier (train once, serialize the log-probability tables,
  score batches with one numpy pass).
* :class:`BpeTokenizer` — a byte-pair-encoding tokenizer with a LEARNED
  merge table (Sennrich et al. 2016 training loop), applied per batch with
  a per-worker word cache.

Both follow the same production shape as a fastText / sentencepiece plug:
a trained artifact serialized to bytes, shipped inside the pickled factory,
deserialized once per worker, applied per Arrow batch.
"""

from __future__ import annotations

import collections
import io
import pickle

import numpy as np

# ---------------------------------------------------------------------------
# naive-Bayes character-trigram language id
# ---------------------------------------------------------------------------


def _char_trigrams(text: str) -> list[str]:
    t = f"  {text.lower()}  "
    return [t[i : i + 3] for i in range(len(t) - 2)]


def train_naive_bayes_langid(
    samples: list[tuple[str, str]], alpha: float = 1.0
) -> bytes:
    """Train a multinomial NB classifier over character trigrams from
    ``(text, label)`` pairs; returns the serialized artifact (vocabulary,
    per-class log priors, per-class log likelihoods with Laplace
    smoothing)."""
    if not samples:
        raise ValueError("need at least one training sample")
    labels = sorted({lab for _, lab in samples})
    counts: dict[str, collections.Counter] = {
        lab: collections.Counter() for lab in labels
    }
    docs_per_label = collections.Counter()
    for text, lab in samples:
        counts[lab].update(_char_trigrams(text))
        docs_per_label[lab] += 1
    vocab = sorted(set().union(*[set(c) for c in counts.values()]))
    v_index = {g: i for i, g in enumerate(vocab)}
    loglik = np.zeros((len(labels), len(vocab)), dtype=np.float64)
    for li, lab in enumerate(labels):
        c = np.zeros(len(vocab), dtype=np.float64)
        for g, n in counts[lab].items():
            c[v_index[g]] = n
        loglik[li] = np.log((c + alpha) / (c.sum() + alpha * len(vocab)))
    total = sum(docs_per_label.values())
    logprior = np.array(
        [np.log(docs_per_label[lab] / total) for lab in labels], dtype=np.float64
    )
    buf = io.BytesIO()
    pickle.dump(
        {"labels": labels, "vocab": vocab, "loglik": loglik, "logprior": logprior},
        buf,
        protocol=4,
    )
    return buf.getvalue()


class NaiveBayesLangId:
    """Picklable model factory: carries the trained artifact bytes; calling
    the instance (once per worker) deserializes it and returns
    ``predict(list[str]) -> list[str]``.  ``marker_dir``, when set, writes
    one file per instantiation — the test hook proving once-per-worker."""

    def __init__(self, artifact: bytes, marker_dir: str | None = None):
        self.artifact = artifact
        self.marker_dir = marker_dir

    def __call__(self):
        import os
        import uuid

        if self.marker_dir:
            name = f"{os.getpid()}-{uuid.uuid4().hex}"
            with open(os.path.join(self.marker_dir, name), "w") as fh:
                fh.write("instantiated")
        model = pickle.loads(self.artifact)
        v_index = {g: i for i, g in enumerate(model["vocab"])}
        loglik, logprior = model["loglik"], model["logprior"]
        labels = model["labels"]

        def predict(texts: list[str]) -> list[str]:
            out = []
            for t in texts:
                x = np.zeros(loglik.shape[1], dtype=np.float64)
                for g in _char_trigrams(t or ""):
                    i = v_index.get(g)
                    if i is not None:
                        x[i] += 1.0
                out.append(labels[int(np.argmax(logprior + loglik @ x))])
            return out

        return predict


# ---------------------------------------------------------------------------
# BPE tokenizer with a learned merge table
# ---------------------------------------------------------------------------

_EOW = "</w>"


def train_bpe(texts: list[str], n_merges: int) -> bytes:
    """Learn a BPE merge table (Sennrich et al. 2016): start from
    characters + an end-of-word marker, repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically for determinism).
    Returns the serialized merge list."""
    word_freq = collections.Counter()
    for t in texts:
        for w in (t or "").lower().split():
            word_freq[w] += 1
    words = {w: tuple(w) + (_EOW,) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, sym in words.items():
            f = word_freq[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return pickle.dumps(merges, protocol=4)


def _bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    sym = tuple(word) + (_EOW,)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for pair in zip(sym, sym[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best_pair:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = tuple(out)
    return sym


class BpeTokenizer:
    """Picklable BPE factory: ships the learned merge table; per worker it
    builds the rank map plus a word->pieces cache, and ``predict`` returns
    per-text piece counts (the ``model_token_count`` contract)."""

    def __init__(self, artifact: bytes, marker_dir: str | None = None):
        self.artifact = artifact
        self.marker_dir = marker_dir

    def tokenize(self, text: str) -> list[str]:
        """Driver-side reference path (no caching) for parity tests."""
        ranks = {p: i for i, p in enumerate(pickle.loads(self.artifact))}
        out: list[str] = []
        for w in (text or "").lower().split():
            out.extend(_bpe_encode_word(w, ranks))
        return out

    def __call__(self):
        import os
        import uuid

        if self.marker_dir:
            name = f"{os.getpid()}-{uuid.uuid4().hex}"
            with open(os.path.join(self.marker_dir, name), "w") as fh:
                fh.write("instantiated")
        ranks = {p: i for i, p in enumerate(pickle.loads(self.artifact))}
        cache: dict[str, int] = {}

        def predict(texts: list[str]) -> list[int]:
            out = []
            for t in texts:
                n = 0
                for w in (t or "").lower().split():
                    c = cache.get(w)
                    if c is None:
                        c = cache[w] = len(_bpe_encode_word(w, ranks))
                    n += c
                out.append(n)
            return out

        return predict
