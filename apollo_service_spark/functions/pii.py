"""PII detection + redaction column expressions (training-data hygiene).

A web-text corpus headed into a training pipeline must be scrubbed of
personally identifiable information.  This module implements the standard
regex tier — emails, phone numbers, IPv4 addresses — as pure Catalyst
column expressions (``regexp_extract_all`` / ``regexp_replace``), so the
scrub is JVM-side, whole-stage-codegen'd, and costs one scan at any scale.
No Python runs per row.

The patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB/Go): character classes, bounded quantifiers and
``\\b`` word boundaries only — no lookarounds, no backreferences — so the
exact same pattern string drives both the engine and the SQL oracle, and
the oracle gate verifies byte-identical redacted output.

At 100 TB this is the cheapest possible shape: a ``select`` with three
regex passes fused into one codegen stage, no shuffle, no UDF.  (Reference
has no PII stage; this comes from the LLM-pipeline brief.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Patterns — common Java-regex / RE2 subset (see module docstring).
# ---------------------------------------------------------------------------
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# optional +country group, then 3-3/4-4 digit groups separated by '-' or ' '
# (the country group is genuinely optional: '555-012-3456' matches too).
# Boundary guards (ADVICE r4): the leading `(?:\+|\b)` and trailing `\b`
# stop matches from starting or ending INSIDE a digit run — '1234-567-8901'
# previously redacted to '1<PHONE>'; now it doesn't match at all (RE2 has no
# lookbehind, so `\b` — which both dialects treat identically between ASCII
# word/non-word chars — is the strongest symmetric guard available).
# Residual partial-run cases: a dash is itself a word boundary, so a
# dash-delimited LONGER run whose tail parses as a full phone still
# truncates (e.g. '1234-567-890-1234' → '1234-<PHONE>'); accepting that
# keeps legit dash-prefixed phones ('call-555-012-3456') redactable.  The
# Unicode-vs-ASCII `\b` caveat documented for IPV4_PATTERN below applies to
# the phone boundaries equally.
PHONE_PATTERN = r"(?:\+|\b)(?:\d{1,3}[- ])?\d{3}[- ]\d{3,4}[- ]\d{4}\b"
# KNOWN dialect edge (found by tests/test_pii.py's cross-engine fuzz): \b is
# Unicode-aware in Java ('ü' is a word char, so '1.2.3.4ü' does NOT end at a
# boundary) but ASCII-only in RE2 (it does).  RE2 has no lookarounds, so the
# boundary cannot be written symmetrically — the byte-exact cross-engine
# contract therefore covers matches whose neighbors are ASCII (all real IP
# notation); a non-ASCII LETTER glued directly to the digits redacts under
# the oracle but not the engine.  Pinned by
# test_known_unicode_boundary_divergence so the limitation stays visible.
IPV4_PATTERN = r"\b\d{1,3}(\.\d{1,3}){3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"

# Redaction order matters only in that earlier placeholders must not create
# text the later patterns match; the tokens contain no digits or '@', so
# email → phone → ip is safe in any order.  Keep it fixed for determinism.
_REDACTIONS = (
    (EMAIL_PATTERN, EMAIL_TOKEN),
    (PHONE_PATTERN, PHONE_TOKEN),
    (IPV4_PATTERN, IPV4_TOKEN),
)


def count_emails(col) -> Column:
    """Number of email-shaped substrings (before redaction)."""
    return F.size(F.regexp_extract_all(col, F.lit(EMAIL_PATTERN), F.lit(0)))


def count_phones(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PHONE_PATTERN), F.lit(0)))


def count_ipv4(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(IPV4_PATTERN), F.lit(0)))


def redact_pii(col) -> Column:
    """Replace every email / phone / IPv4 occurrence with its placeholder
    token.  Spark's ``regexp_replace`` is replace-all; the DuckDB oracle
    passes the ``'g'`` flag for the same semantics."""
    out = col if isinstance(col, Column) else F.col(col)
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
