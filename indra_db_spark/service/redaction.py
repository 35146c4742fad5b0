"""Evidence-text redaction for license-restricted content (reference:
call_handlers.py:274-302 — Elsevier fulltext evidence is truncated to 200
characters plus a marker for callers without the elsevier permission;
medscan evidence text is removed entirely without the medscan permission).

Medscan is a READER and elsevier a CONTENT SOURCE — two different
dimensions of an evidence row, so they are checked independently:
the reader comes from ``annotations.source_api`` / ``text_refs.READER``,
the content source from ``text_refs.SOURCE``.

Driver-side: redaction applies to the assembled statement page (bounded by
limit × ev_limit), never to the distributed plan.
"""

from __future__ import annotations

REDACT_CHARS = 200
REDACT_MARKER = "[Text restricted by licensing agreement; truncated]"
RESTRICTED_SOURCES = {"elsevier"}


def redact_evidence_text(
    statements: dict[int, dict],
    has_elsevier: bool = False,
    has_medscan: bool = False,
) -> dict[int, dict]:
    """Redact in place and return the statement-page dict."""
    for stmt in statements.values():
        for ev in stmt.get("evidence", ()):
            refs = ev.get("text_refs") or {}
            reader = (
                ev.get("annotations", {}).get("source_api")
                or refs.get("READER")
                or ""
            ).lower()
            content_source = (refs.get("SOURCE") or "").lower()
            text = ev.get("text")
            if not text:
                continue
            if reader == "medscan" and not has_medscan:
                ev["text"] = None
            elif (
                content_source in RESTRICTED_SOURCES
                and not has_elsevier
                and len(text) > REDACT_CHARS
            ):
                ev["text"] = text[:REDACT_CHARS] + REDACT_MARKER
    return statements
