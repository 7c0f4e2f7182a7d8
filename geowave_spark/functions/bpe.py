"""Pure-python byte-pair encoding — the pluggable subword tokenizer for
the corpus family.

The regex word splitter (operators/text.py ``py_tokens``/``tokens_col``)
is fine for oracle parity but its counts do not match what a production
subword tokenizer produces, so ``pack_sequences``/``token_stats`` built on
it would mis-provision a real training run.  This module supplies the
missing piece with zero dependencies: the classic BPE procedure (Sennrich
et al. 2016, the public algorithm GPT-2's tokenizer family derives from) —
words split to characters plus an end-of-word marker, the most frequent
adjacent symbol pair merged repeatedly, encoding replays merges in rank
order.

Determinism contract (everything the SQL-replay oracles need):

* training iterates word frequencies in sorted order and breaks frequency
  ties on the lexicographically smallest pair — identical merges for
  identical corpora regardless of dict/hash order;
* encoding applies the lowest-ranked mergeable pair first (ties impossible:
  ranks are unique), so ``encode`` is a pure function of (merges, word);
* the Spark path broadcasts the merges list to an Arrow-batched pandas UDF
  with a per-word memo (real corpora repeat words heavily — the memo turns
  per-token work into per-distinct-word work per batch).

The word splitter is shared with the rest of the corpus family
(``py_tokens``), so regex-token counts and BPE counts differ ONLY by the
subword segmentation — the quantity a capacity plan actually cares about.
"""

from __future__ import annotations

import pandas as pd  # module top: pandas_udf type hints resolve in globals
from pyspark.sql import Column

EOW = "</w>"  # end-of-word marker (Sennrich's convention)


def word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def train_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a word→frequency table.

    Stops early when no pair occurs twice (merging singletons only bloats
    the vocab).  Returns merges in learned order (rank = position)."""
    seqs: list[list[str]] = []
    freqs: list[int] = []
    for w in sorted(word_freqs):
        if not w:
            continue
        seqs.append(list(word_symbols(w)))
        freqs.append(int(word_freqs[w]))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in zip(seqs, freqs):
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for sym in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    sym[i : i + 2] = [joined]
                else:
                    i += 1
    return merges


class BpeTokenizer:
    """Frozen merge table + encoder.  ``encode`` applies the lowest-ranked
    mergeable pair first until none applies — the standard BPE inference
    loop; ``count_text`` sums subword counts over ``py_tokens`` words."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        self._memo: dict[str, int] = {}

    def encode(self, word: str) -> list[str]:
        sym = list(word_symbols(word))
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return sym

    def count_word(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            n = len(self.encode(word))
            self._memo[word] = n
        return n

    def count_text(self, text: str) -> int:
        from geowave_spark.operators.text import py_tokens

        return sum(self.count_word(w) for w in py_tokens(text))

    def count_col(self, text: Column) -> Column:
        """Arrow-batched token-count column: the merges list rides the UDF
        closure (a broadcast-sized literal), the per-word memo amortizes
        across the batch."""
        from pyspark.sql.functions import pandas_udf

        merges = self.merges

        @pandas_udf("long")
        def bpe_count(s: pd.Series) -> pd.Series:
            tok = BpeTokenizer(merges)
            return s.map(lambda t: tok.count_text(t) if t is not None else 0)

        return bpe_count(text)


def train_bpe_from_word_counts(rows, n_merges: int = 64) -> BpeTokenizer:
    """(word, freq) rows (e.g. a collected Spark groupBy — bounded by
    vocabulary size, not corpus size) → tokenizer."""
    return BpeTokenizer(train_bpe({w: f for w, f in rows}, n_merges))
