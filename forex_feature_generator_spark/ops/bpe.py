"""Vocab-file-driven BPE tokenization — the real encoder behind
`n_bpe_tokens` (upgrades ops/text.py's regex ESTIMATE to actual byte-pair
encoding against a frozen merge table).

Algorithm = standard BPE encode: start from characters, apply each merge
rule exhaustively in rank order. Because the merge table is VALID (every
operand is a base symbol or the output of a strictly earlier merge, and all
outputs are distinct — the shape every learned BPE vocab has), applying
rules sequentially by rank is exactly equivalent to the classic
lowest-rank-pair-first loop (tests/test_bpe.py proves this against an
independent classic-algorithm implementation).

Spark-first execution — NO Python in the hot path: the symbol stream is a
delimited string (each symbol wrapped in its own commas, so one literal
`replace` per merge is exhaustive and boundary-safe), the merge table is
constant-folded into a chain of JVM `replace` expressions (the "broadcast
vocab" costs zero bytes at runtime), and ids come from a codegen'd CASE
chain. Per row the cost is O(len * n_merges) streaming string work inside
whole-stage codegen — no shuffle, no UDF, trivially 100 TB-parallel.
DuckDB-oracle-checkable: the identical replace chain exists in SQL
(__spark_entry__.q43).

Wrapped representation correctness: symbols `s1 s2 s3` are stored as
",s1,,s2,,s3," — every symbol carries BOTH flanking delimiters, so replacing
",a,,b," with ",ab," (a) can never match across a symbol boundary (the char
before a symbol's leading "," is another ",", never a letter), and (b) never
consumes a neighbour's delimiter, so one left-to-right replace-all per rule
merges every occurrence (a merge output can't recreate its own pair: that
would need ab == a or ab == b)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# Frozen merge table (rank order). VALIDITY invariants, asserted below and
# relied on for sequential==classic equivalence:
#   * every operand is a base symbol (a-z, 0-9, '_') or an EARLIER output
#   * all outputs are distinct
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"), ("r", "e"),
    ("e", "r"), ("an", "d"), ("o", "u"), ("in", "g"), ("s", "t"), ("a", "r"),
    ("o", "r"), ("e", "n"), ("o", "f"), ("i", "s"), ("a", "t"), ("i", "t"),
    ("t", "o"), ("the", "_"), ("and", "_"), ("of", "_"), ("is", "_"),
    ("in", "_"), ("to", "_"), ("at", "_"), ("er", "_"), ("s", "_"),
]

BASE_SYMBOLS = ["_"] + [chr(c) for c in range(ord("0"), ord("9") + 1)] \
    + [chr(c) for c in range(ord("a"), ord("z") + 1)]

# vocab: base symbols first (ids 0..36), then one id per merge output
VOCAB: dict[str, int] = {s: i for i, s in enumerate(BASE_SYMBOLS)}
for _a, _b in MERGES:
    _known = set(VOCAB)
    assert _a in _known and _b in _known, (_a, _b)       # operands exist
    assert _a + _b not in VOCAB, (_a, _b)                # outputs distinct
    VOCAB[_a + _b] = len(VOCAB)


def _norm(col):
    """normalize_text (lower, non-alnum runs -> single space, trim) with the
    word separator made an explicit '_' symbol — GPT-style: space-joined
    tokens are ordinary vocab entries, merges may cross word boundaries."""
    return F.replace(normalize_text(col), F.lit(" "), F.lit("_"))


def _encoded_string(col):
    """The fully-merged delimited symbol stream for a text column."""
    s = F.regexp_replace(_norm(col), "(.)", ",$1,")
    for a, b in MERGES:
        s = F.replace(s, F.lit(f",{a},,{b},"), F.lit(f",{a}{b},"))
    return s


def _sym_id(sym_col):
    """symbol -> vocab id as a codegen'd CASE chain (element_at on a map
    literal would throw under ANSI for a missing key; the chain yields NULL,
    which the encoder's closed alphabet makes unreachable)."""
    return reduce(lambda acc, kv: acc.when(sym_col == kv[0], kv[1]),
                  list(VOCAB.items())[1:],
                  F.when(sym_col == list(VOCAB)[0], 0)).cast("int")


def bpe_encode(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe_tokens: long, token_ids: array<int>) — real BPE token
    count + ids per document."""
    out = docs.withColumn("__s", _encoded_string(F.col(text_col)))
    syms = F.expr("split(substring(__s, 2, length(__s) - 2), ',,')")
    empty = F.length("__s") == 0
    n = F.when(empty, F.lit(0)).otherwise(F.size(syms)).cast("long")
    ids = (F.when(empty, F.array().cast("array<int>"))
           .otherwise(F.transform(syms, _sym_id)))
    return out.select(id_col, n.alias("n_bpe_tokens"), ids.alias("token_ids"))


def encode_py(text: str) -> list[str]:
    """Sequential-by-rank reference encoder (pure Python, mirrors the Spark
    replace chain symbol-for-symbol; tests/test_bpe.py checks BOTH against
    the independent classic lowest-rank-pair-first algorithm)."""
    import re
    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().replace(" ", "_")
    syms = list(t)
    for a, b in MERGES:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
