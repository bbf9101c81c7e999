"""PII detection + redaction for training-data pipelines.

Scrubbing personally-identifiable text spans (emails, phone numbers,
IP addresses) is a standard pass between crawl extraction and training —
the engine's crawl side *collects* contact emails on purpose
(reference semantics), and this operator is its pipeline-side dual:
count and strip such spans from document text before it becomes
training data.

Everything is JVM-native regex (``regexp_count`` / ``regexp_replace``
columns — no Python in the hot path, one scan for any number of
patterns), and every pattern is written in the common subset of Java
regex and RE2 (character classes, bounded repetition, no backreferences
or lookaround) so the DuckDB oracle evaluates the IDENTICAL pattern
text: detection counts and the redacted string are bit-comparable
across engines. Patterns deliberately favor precision over recall
(false redactions destroy training text silently); swapping in a
heavier NER model would ride ``mapInPandas`` like the multimodal
kernels, behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: redaction applies in this order, and placeholders are chosen
# so no pattern matches another's placeholder
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — lowercase subset (apply to lowercased text)
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    # 3-3-2-2 dashed phone groups (the engine's crawl corpus format);
    # bounded-repetition only, identical semantics in Java regex and RE2
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{2}-[0-9]{2}",
    # dotted-quad IPv4 (syntactic: 1-3 digits per octet)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_count(text, kind: str) -> Column:
    """Number of ``kind`` spans in ``text`` (one codegen regexp_count)."""
    return F.regexp_count(F.lower(text), F.lit(PII_PATTERNS[kind])).cast(
        "long"
    )


def redact_pii(text) -> Column:
    """``text`` lowercased with every PII span replaced by ``<KIND>``.

    Lowercasing first keeps the match set identical to ``pii_count`` and
    the DuckDB twin (`lower()` then `regexp_replace(..., 'g')`).
    Patterns apply in ``PII_PATTERNS`` order; emails go first so the
    phone/ipv4 passes never see address-local digits."""
    out = F.lower(text)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
