"""RE2-compatible regex constants for the address-cleaning chain.

Semantics re-derived from the reference's SQL regex builders
(/root/reference/uk_address_matcher/cleaning/steps/regexes.py:4-160 and
normalisation.py:50-117).  Both DuckDB's ``regexp_replace`` and pyarrow's
``replace_substring_regex`` are RE2-based, so applying the *same* pattern
strings through ``pyarrow.compute`` reproduces the reference's output
bit-for-bit — these constants are therefore semantics-bearing: do not
reorder or "fix" them.

Each entry is ``(pattern, replacement)``; the first-pass chain is applied
in order, globally, followed by a trim.
"""

from __future__ import annotations

# --- individual rules (reference regexes.py) ---------------------------------

#: ``[,.]`` -> space  (remove_commas_periods)
REMOVE_COMMAS_PERIODS = (r"[,.]", " ")

#: apostrophes removed entirely (remove_apostrophes)
REMOVE_APOSTROPHES = (r"'", "")

#: collapse whitespace runs (remove_multiple_spaces)
REMOVE_MULTIPLE_SPACES = (r"\s+", " ")

#: ``Unit 5/6`` -> ``Unit 5-6`` (replace_fwd_slash_with_dash)
REPLACE_FWD_SLASH_WITH_DASH = (r"/", "-")

#: ``C230`` / ``C  230`` -> ``C 230`` (separate_letter_num)
SEPARATE_LETTER_NUM = (r"\b([A-Za-z])\s*(\d+)\b", r"\1 \2")

#: ``123-A `` / ``456 B `` -> ``123A `` / ``456B `` (standarise_num_letter)
STANDARISE_NUM_LETTER = (r"(\d{1,4})[[:punct:]\s]([A-Za-z])\s", r"\1\2 ")

#: normalises whitespace after a ``FLAT <num><letter?>`` token.  NOTE: despite
#: the reference docstring ("move flat to front") this regex only rewrites
#: ``FLAT 1A   REST`` -> ``FLAT 1A REST`` — we replicate the *behaviour*
#: (reference regexes.py:132-153; quirk documented in SURVEY.md §2.10).
MOVE_FLAT_TO_FRONT = (r"\b(FLAT \d+[A-Z]?)\s+(.*)", r"\1 \2")

#: first-pass cleaning chain, in reference order (normalisation.py:90-117);
#: ``standarise_num_dash_num`` and ``remove_repeated_tokens`` are commented
#: out in the reference and intentionally absent here.
FIRST_PASS_CHAIN: list[tuple[str, str]] = [
    REMOVE_COMMAS_PERIODS,
    REMOVE_APOSTROPHES,
    REMOVE_MULTIPLE_SPACES,
    REPLACE_FWD_SLASH_WITH_DASH,
    SEPARATE_LETTER_NUM,
    STANDARISE_NUM_LETTER,
    MOVE_FLAT_TO_FRONT,
]

#: second-pass chain on ``address_without_numbers`` (token_parsing.py:220-236)
SECOND_PASS_CHAIN: list[tuple[str, str]] = [REMOVE_MULTIPLE_SPACES]

# --- postcode ----------------------------------------------------------------

#: UK postcode outward/inward normalisation (normalisation.py:50-71)
UK_POSTCODE = (r"^([A-Z]{1,2}\d[A-Z\d]?|GIR)\s*(\d[A-Z]{2})$", r"\1 \2")

# --- token extraction (token_parsing.py) -------------------------------------

#: floor-position words (token_parsing.py:141)
FLOOR_POSITIONS = (
    r"\b(BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR"
    r"|TOP FLOOR|GARDEN)\b"
)

#: single letter optionally preceded by up to 4 digits (token_parsing.py:142)
FLAT_LETTER = r"\b\d{0,4}([A-Za-z])\b"

#: leading ``<digits><letter>`` (token_parsing.py:143)
LEADING_LETTER = r"^\s*\d+([A-Za-z])\b"

#: ``FLAT|UNIT|APARTMENT <tok-with-digit> <tok-with-digit>`` — first captured
#: group only used when <= 4 chars (token_parsing.py:145, 160-166)
FLAT_NUMBER = r"\b(FLAT|UNIT|APARTMENT)\s+(\S*\d\S*)\s+\S*\d\S*\b"

#: numeric token / range (token_parsing.py:206-210)
NUMERIC_TOKEN = r"\b(\d{1,5}-\d{1,5}|[A-Za-z]?\d{1,5}[A-Za-z]?)\b"

#: digits-run extraction used to split numeric tokens into columns
#: (tokenisation.py:30-34)
DIGITS = r"\d+"
