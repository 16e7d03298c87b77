"""Real byte-pair-encoding token counting (VERDICT r2 #3).

The regex variant (``queries.q_doc_bpe_tokens``) counts GPT-2-style
PRE-tokens only; this kernel adds the actual BPE layer: train a small
deterministic merge table from corpus pre-token frequencies, then apply
the merges greedily by rank to count true subword tokens — the single
most-used operator in real training-data pipelines.

Everything here is pure deterministic Python: the SAME functions run
inside Arrow-batched Spark stages (``queries.q_doc_bpe_real``) and
verbatim in the single-process pytest reference, so distributed-vs-local
parity is an exact-equality check.

Determinism contract:
  * training ties (equal pair counts) break on the lexicographically
    smallest pair;
  * merge application is leftmost-first, merge-all-occurrences — the
    identical rule at train and encode time;
  * both are independent of corpus partitioning because training sees
    only the (token -> frequency) map, which commutes.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable

# The GPT-2-ish pre-tokenizer families (word / number / punctuation runs)
# — same pattern as the regex-only query, evaluated by Python `re` on BOTH
# the Spark (pandas-UDF) and reference sides so engine regex dialects
# can't diverge.
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def pretokenize(text: str) -> list:
    return PRETOKEN_RE.findall(text or "")


def count_pretokens(texts: Iterable) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(pretokenize(t))
    return c


def _merge_all(syms: list, a: str, b: str) -> list:
    """Replace every adjacent (a, b) with a+b, scanning left to right."""
    out: list = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(freqs: dict, n_merges: int = 64) -> list:
    """(pre-token -> frequency) -> ordered merge list [(left, right), ...].

    Classic BPE: repeatedly merge the most frequent adjacent symbol pair
    (weighted by word frequency).  Ties break on the smallest pair, and
    training stops early when the best pair occurs < 2 times (merging a
    hapax buys nothing)."""
    words = {w: list(w) for w in freqs if w}
    merges: list = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                pair_counts[p] += f
        if not pair_counts:
            break
        best, best_n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            if a in syms:  # cheap guard; _merge_all is the hot loop
                words[w] = _merge_all(syms, a, b)
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Apply merges to one pre-token, lowest rank first (GPT-2 order)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_all(syms, best_pair[0], best_pair[1])
    return syms


def bpe_token_count(text: str, ranks: dict, cache: dict,
                    max_cache: int = 1_000_000) -> int:
    """True-BPE token count of one document.  ``cache`` memoizes per-word
    encodings (Zipf makes this a large win); when every word is already
    cached the count is ONE C-level ``sum(map(dict.__getitem__, ...))``
    — measured 1.6x over the per-word interpreter loop on the deep-vocab
    corpus (BENCH round-5).  ``max_cache`` bounds executor memory on
    hapax-heavy corpora: beyond it new words are encoded but not
    stored (a logged-cap analogue — correctness never depends on the
    cache)."""
    words = PRETOKEN_RE.findall(text or "")
    try:
        return sum(map(cache.__getitem__, words))
    except KeyError:
        pass
    get = cache.get
    total = 0
    room = len(cache) < max_cache
    for w in words:
        n = get(w)
        if n is None:
            n = len(encode_word(w, ranks))
            if room:
                cache[w] = n
                room = len(cache) < max_cache
        total += n
    return total


# executor-process-wide encode memos, keyed by a per-query token carried
# inside the broadcast (object identity is not a safe key across GC).
# Bounded: a new token past the cap FLUSHES ALL memos (full-clear, not
# LRU — simplest bound; a concurrent query re-warms from the corpus on
# its next batch).  The memo is an optimization, never a correctness
# dependency.
_ENCODE_MEMOS: dict = {}


def encode_memo(token: str, max_queries: int = 8) -> dict:
    memo = _ENCODE_MEMOS.get(token)
    if memo is None:
        if len(_ENCODE_MEMOS) >= max_queries:
            _ENCODE_MEMOS.clear()
        memo = _ENCODE_MEMOS[token] = {}
    return memo
