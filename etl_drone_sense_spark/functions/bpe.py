"""Frozen-merges byte-pair encoding as a pure column pipeline.

Real training pipelines budget sequences in TOKENIZER tokens, not
whitespace tokens (r12 VERDICT item 2) — this module is a deterministic
BPE *encoder* over a frozen, rank-ordered merges table, expressed as one
narrow string-expression chain with a DuckDB rendering built from the
same table, so the driver's exact-hash gate certifies the tokenizer
end-to-end. (``functions/text.bpe_token_count`` is a REGEX
pre-tokenizer — a splitter; this is the actual merge encoder.)

Encoding state machine
----------------------
A word's token sequence is encoded as a flat string with two marker
bytes that cannot occur in word text (words are ``[a-z0-9]+`` runs of
the lowercased document): ``\\x1e tok \\x1f`` per token, concatenated.
Applying merge ``(a, b) -> ab`` is then ONE plain (non-regex) string
replace::

    replace(state, '\\x1e' a '\\x1f\\x1e' b '\\x1f', '\\x1e' ab '\\x1f')

Why a single replace per rank is EXHAUSTIVE for that rank: ``replace``
substitutes non-overlapping occurrences left-to-right, continuing after
each replacement — exactly the leftmost-first fold BPE specifies — and a
merge can never create a new occurrence of ITS OWN pair (that would need
``ab == a`` or ``ab == b``, impossible since ``ab`` is strictly longer).
Adjacent occurrences share no characters (each token's markers are its
own), so none are skipped. Overlapping self-pairs resolve leftmost:
``l·l·l`` under ``(l, l)`` becomes ``ll·l``, the standard result.

Rank-order application = greedy-min-rank BPE for this table: the table
is validated at import so every merge's constituents are single
characters or results of strictly-earlier merges, hence when rank k is
applied no pair of rank < k can exist anywhere (earlier ranks were
applied exhaustively, and later merges cannot create an earlier pair
whose constituents they don't produce — checked by ``_validate``, which
rejects any merge whose result string equals a constituent of an
earlier merge).

Scale shape: the whole encoder is ONE narrow projection — M nested
``replace`` calls over the document string — no UDF, no shuffle, no
loop over DataFrame stages; the merges table is folded into the
expression as constants (a broadcast of a frozen table, degenerated to
literals). At 100 TB it is a map over the corpus scan, nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Token-boundary markers: ASCII record separator opens a token, unit
# separator closes it. Words are [a-z0-9]+ so neither occurs in text.
O = "\x1e"
C = "\x1f"

# Frozen, rank-ordered merges (a learned-table stand-in: high-frequency
# English bigraphs plus digit pairs so numeric strings exercise the
# encoder too). Every constituent is a single [a-z0-9] character or the
# result of a strictly-earlier merge — validated at import.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),      # th
    ("th", "e"),     # the
    ("i", "n"),      # in
    ("in", "g"),     # ing
    ("a", "n"),      # an
    ("an", "d"),     # and
    ("o", "n"),      # on
    ("t", "i"),      # ti
    ("ti", "on"),    # tion
    ("e", "r"),      # er
    ("r", "e"),      # re
    ("a", "t"),      # at
    ("e", "n"),      # en
    ("o", "r"),      # or
    ("e", "s"),      # es
    ("s", "t"),      # st
    ("a", "r"),      # ar
    ("o", "u"),      # ou
    ("e", "d"),      # ed
    ("i", "s"),      # is
    ("i", "t"),      # it
    ("a", "l"),      # al
    ("l", "e"),      # le
    ("c", "h"),      # ch
    ("r", "o"),      # ro
    ("u", "s"),      # us
    ("s", "e"),      # se
    ("m", "e"),      # me
    ("d", "e"),      # de
    ("c", "on"),     # con
    ("the", "r"),    # ther
    ("w", "h"),      # wh
    ("q", "u"),      # qu
    ("l", "l"),      # ll
    ("o", "o"),      # oo
    ("s", "s"),      # ss
    ("e", "e"),      # ee
    ("0", "0"),      # 00
    ("1", "9"),      # 19
    ("2", "0"),      # 20
    ("20", "0"),     # 200
)


def _validate(merges: tuple[tuple[str, str], ...]) -> None:
    """Reject tables whose rank-order application could diverge from
    greedy-min-rank BPE (see module docstring): constituents must exist
    before use, pairs must be unique, and no later merge may produce a
    string that an earlier merge consumes as a constituent (that is the
    one way a later rank could create an earlier-rank pair)."""
    formed: set[str] = set()
    seen_pairs: set[tuple[str, str]] = set()
    consumed_later: dict[str, int] = {}
    for rank, (a, b) in enumerate(merges):
        for part in (a, b):
            if len(part) > 1 and part not in formed:
                raise ValueError(
                    f"merge {rank} ({a!r},{b!r}): constituent {part!r} "
                    "is multi-char but not formed by an earlier merge"
                )
            if len(part) == 1 and not ("a" <= part <= "z" or "0" <= part <= "9"):
                raise ValueError(
                    f"merge {rank}: constituent {part!r} outside [a-z0-9]"
                )
            consumed_later.setdefault(part, rank)
        if (a, b) in seen_pairs:
            raise ValueError(f"duplicate merge pair ({a!r},{b!r})")
        seen_pairs.add((a, b))
        result = a + b
        first_use = consumed_later.get(result)
        if first_use is not None and first_use < rank:
            raise ValueError(
                f"merge {rank} produces {result!r}, consumed by earlier "
                f"merge {first_use} — rank-order application would "
                "diverge from greedy BPE"
            )
        formed.add(result)


_validate(MERGES)

_WORD_RE = "[a-z0-9]+"


# ---------------------------------------------------------------------------
# Spark renderings
# ---------------------------------------------------------------------------


def words(col: Column) -> Column:
    """Maximal [a-z0-9]+ runs of the lowercased text (NULL-safe)."""
    return F.regexp_extract_all(
        F.lower(F.coalesce(col, F.lit(""))), F.lit(_WORD_RE), F.lit(0)
    )


def doc_state(col: Column) -> Column:
    """The document's fully-merged BPE state string: every word encoded
    ``\\x1etok\\x1f``-per-token, words joined by a single space, then the
    frozen merges applied in rank order — one plain replace each."""
    interspersed = F.transform(
        words(col),
        lambda w: F.regexp_replace(w, "(.)", f"{O}$1{C}"),
    )
    state = F.array_join(interspersed, " ")
    for a, b in MERGES:
        state = F.replace(
            state, F.lit(f"{O}{a}{C}{O}{b}{C}"), F.lit(f"{O}{a + b}{C}")
        )
    return state


def token_count(state: Column) -> Column:
    """Exact token count of a state string = number of close markers."""
    return (
        F.length(state) - F.length(F.replace(state, F.lit(C), F.lit("")))
    ).cast("long")


def render(state: Column) -> Column:
    """Space-joined token stream of a state string (word boundaries
    collapse to single spaces along with token boundaries)."""
    out = F.replace(state, F.lit(f"{C}{O}"), F.lit(" "))
    out = F.replace(out, F.lit(O), F.lit(""))
    return F.replace(out, F.lit(C), F.lit(""))


# ---------------------------------------------------------------------------
# DuckDB renderings — built from the SAME table so the oracle cannot
# drift from the engine
# ---------------------------------------------------------------------------


def _sql_lit(s: str) -> str:
    """A DuckDB string literal spelling marker bytes via chr() so the
    oracle SQL stays printable."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ch in (O, C):
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
        else:
            buf += ch
    if buf:
        parts.append(f"'{buf}'")
    return "(" + " || ".join(parts) + ")" if len(parts) > 1 else parts[0]


def words_sql(col: str) -> str:
    return f"regexp_extract_all(lower(coalesce({col}, '')), '{_WORD_RE}')"


def doc_state_sql(col: str) -> str:
    inter = (
        f"list_transform({words_sql(col)}, "
        f"w -> regexp_replace(w, '(.)', chr({ord(O)}) || '\\1' || "
        f"chr({ord(C)}), 'g'))"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — a wordless document must state-encode to ''
    state = f"coalesce(array_to_string({inter}, ' '), '')"
    for a, b in MERGES:
        pat = _sql_lit(f"{O}{a}{C}{O}{b}{C}")
        rep = _sql_lit(f"{O}{a + b}{C}")
        state = f"replace({state}, {pat}, {rep})"
    return state


def token_count_sql(state: str) -> str:
    return (
        f"CAST(length({state}) - "
        f"length(replace({state}, chr({ord(C)}), '')) AS BIGINT)"
    )


def render_sql(state: str) -> str:
    out = f"replace({state}, chr({ord(C)}) || chr({ord(O)}), ' ')"
    out = f"replace({out}, chr({ord(O)}), '')"
    return f"replace({out}, chr({ord(C)}), '')"


# ---------------------------------------------------------------------------
# Pure-Python reference (tests only): the textbook greedy fold
# ---------------------------------------------------------------------------


def encode_word_reference(word: str) -> list[str]:
    """Greedy-min-rank BPE over one word — the definition the expression
    chain must reproduce, kept independent of it for the unit tests."""
    rank = {pair: i for i, pair in enumerate(MERGES)}
    toks = list(word)
    while len(toks) > 1:
        best_i, best_r = -1, len(MERGES)
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]), len(MERGES))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r == len(MERGES):
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


# ---------------------------------------------------------------------------
# Training-side helpers (r13, text_bpe_train): extract the token lists
# and adjacent-pair relation back out of a state string, in both
# dialects, so the learner can count pair frequencies per round.
# ---------------------------------------------------------------------------

# token extraction: every marker-wrapped run; group 1 is the token text
_TOKEN_RE = f"{O}([^{C}]*){C}"


def initial_state(col: Column) -> Column:
    """A document's UNMERGED state (every char its own token) — the
    round-0 input to BPE training."""
    interspersed = F.transform(
        words(col),
        lambda w: F.regexp_replace(w, "(.)", f"{O}$1{C}"),
    )
    return F.array_join(interspersed, " ")


def initial_state_sql(col: str) -> str:
    inter = (
        f"list_transform({words_sql(col)}, "
        f"w -> regexp_replace(w, '(.)', chr({ord(O)}) || '\\1' || "
        f"chr({ord(C)}), 'g'))"
    )
    return f"coalesce(array_to_string({inter}, ' '), '')"


def word_tokens(word_state: Column) -> Column:
    """Token list of ONE word's state string."""
    return F.regexp_extract_all(word_state, F.lit(_TOKEN_RE), F.lit(1))


def word_tokens_sql(word_state: str) -> str:
    return (
        f"regexp_extract_all({word_state}, chr({ord(O)}) || '([^' || "
        f"chr({ord(C)}) || ']*)' || chr({ord(C)}), 1)"
    )


def merge_pattern(a: str, b: str) -> tuple[str, str]:
    """(search, replace) strings applying merge (a, b) to a state."""
    return f"{O}{a}{C}{O}{b}{C}", f"{O}{a + b}{C}"
