"""PROVISIONAL rule-semantics conventions (FIXTURES.md §4).

Two behaviors of the reference are not pinnable without its mocha
fixtures (the reference directory is empty in this sandbox — SURVEY.md
§0). Each lives here as ONE constant so that milestone M8 — re-pinning
against the real fixtures — is a constant flip plus a golden refresh,
not a code hunt. tests/test_provisional_semantics.py exercises BOTH
candidate values of each knob and records exactly which rule shapes
change output under the alternative (VERDICT r01 #9).

Frozen for development: the shipped values below are the contract the
goldens and oracles assert; only a reference inspection may change
them, updating FIXTURES.md §4 and the goldens in the same commit.
"""

# FIXTURES.md §4.1 — joining value when a simple rule matches multiple
# nodes and no `separator` is given. Assumed " "; the alternative
# candidate observed in similar engines is "" (plain concat).
DEFAULT_SEPARATOR = " "

# FIXTURES.md §4.2 — value when a simple (non-array) rule matches
# nothing. Assumed "" (empty string); the alternative is None
# (JS undefined ⇒ the field would be absent/null in the result).
EMPTY_MATCH_VALUE: str | None = ""
