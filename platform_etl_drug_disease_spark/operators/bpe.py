"""BPE tokenizer APPLICATION at corpus scale.

`plans/dedup_text.py:bpe_merge_pair_stats` is the induction side (merge-
pair counting); this module is the serving side: given a trained, ranked
merge list (a tokenizer artifact — small, shipped like any config), segment
text into word pieces.

The greedy merge loop is inherently sequential per word — a genuine
Python-needed case, so this is the repo's canonical Arrow-batched Pandas
UDF hot path (SURVEY §2.9 D2/D3 discipline: no row-at-a-time Python UDFs;
pandas_udf only where DataFrame algebra cannot express the semantics).

The 100-TB insight is WHERE the UDF runs: never over the corpus. Word
segmentation is a pure function of the word, so the pipeline is

    occurrences → distinct words (the dictionary)       [one groupBy]
    dictionary  → pieces via the Pandas UDF             [cost ∝ |vocab|]
    occurrences ⋈ dictionary                            [token-keyed join]

Natural-language vocabulary grows ~O(corpus^0.5) (Heaps' law), so the
Python work is sublinear in the corpus; the join back is the same
word-keyed shape as quality_lm_score's LM join (AQE handles hot stopword
keys). Segmenting occurrences directly would run the loop per token —
orders of magnitude more Python at scale for identical output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_word(word: str, ranks: dict[str, int]) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent piece pair
    (all its non-overlapping occurrences, left to right) until no ranked
    pair remains. ``ranks`` maps concatenated pair → priority (lower merges
    first) — the standard merges-file contract."""
    pieces = list(word)
    while len(pieces) > 1:
        best_rank = None
        for i in range(len(pieces) - 1):
            r = ranks.get(pieces[i] + pieces[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        merged: list[str] = []
        i = 0
        while i < len(pieces):
            if (
                i + 1 < len(pieces)
                and ranks.get(pieces[i] + pieces[i + 1]) == best_rank
            ):
                merged.append(pieces[i] + pieces[i + 1])
                i += 2
            else:
                merged.append(pieces[i])
                i += 1
        pieces = merged
    return pieces


def bpe_pieces_udf(merges: list[str]) -> Column:
    """Factory for the segmentation Pandas UDF: ``merges`` is the ranked
    pair list (concatenated form, highest priority first). Returns a
    callable column transformer word → array<string> of pieces."""
    ranks = {m: i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: segment_word(w, ranks) if w else [])

    return seg


def segment_dictionary(
    words: DataFrame, merges: list[str], word_col: str = "word"
) -> DataFrame:
    """Segment a DISTINCT-word dictionary: adds ``pieces`` (array<string>)
    and ``n_pieces``. Callers join this back to occurrence tables by word —
    see module docstring for why the UDF must never see occurrences."""
    seg = bpe_pieces_udf(merges)
    return words.withColumn("pieces", seg(F.col(word_col))).withColumn(
        "n_pieces", F.size("pieces")
    )
