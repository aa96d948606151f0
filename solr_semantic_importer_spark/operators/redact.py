"""PII redaction / detection for training-data pipelines.

A corpus destined for model training gets scrubbed of obvious PII before
anything else touches it; the standard first pass is regex-class redaction
(emails, IPs, phone-shaped digit runs) exactly as practiced in large
public corpus pipelines (e.g. the C4 / RefinedWeb / FineWeb cleaning
steps). Spark-first: everything is a JVM ``regexp_replace`` /
``regexp_count`` Column expression -- whole-stage codegen, no Python in
the hot path, scales linearly with the scan.

Patterns deliberately use the Java-regex AND RE2 common subset (no
lookarounds, no backrefs) so the DuckDB oracle evaluates the identical
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts"]

# ordered: redaction applies email first so its digits never feed the
# phone pattern. NO \b anywhere: Java's \b is Unicode-aware while RE2's
# (DuckDB's) is ASCII, so a boundary-anchored pattern silently misses an
# IP adjacent to CJK/accented text on the Spark side while the oracle
# catches it. Boundary-free matching over-redacts (a version string
# "1.2.3.4" reads as an IP) -- the safe direction for a scrubber -- and
# behaves identically in both engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    # international-ish digit runs: 9+ digits allowing separators
    "phone": (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
}


def _check_kinds(kinds: tuple[str, ...]) -> None:
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(
            f"unknown PII kinds {sorted(unknown)}; valid: "
            f"{sorted(PII_PATTERNS)} -- a silently-ignored typo here "
            "would ship unredacted PII"
        )


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII class with its placeholder token, in PII_PATTERNS
    order (email before phone, so an address's digits are already gone
    when the phone pattern runs). Unknown ``kinds`` raise."""
    _check_kinds(kinds)
    out = col
    for kind in PII_PATTERNS:
        if kind in kinds:
            pat, repl = PII_PATTERNS[kind]
            out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> dict[str, Column]:
    """Per-class occurrence counts (audit metric: how much was scrubbed).
    Counts are taken on the SAME progressively-redacted stream the
    redaction itself sees, so e.g. an email's digits are never double
    counted as a phone. Unknown ``kinds`` raise."""
    _check_kinds(kinds)
    out: dict[str, Column] = {}
    cur = col
    for kind in PII_PATTERNS:
        if kind in kinds:
            pat, repl = PII_PATTERNS[kind]
            out[f"n_{kind}"] = F.regexp_count(cur, F.lit(pat))
            cur = F.regexp_replace(cur, pat, repl)
    return out
