"""Host-side expression analysis (L3 of the reference's layer map)."""

from __future__ import annotations

from .base import ExpressionParser, ParsedExpression  # noqa: F401
from .heuristic import HeuristicParser  # noqa: F401


def get_parser(prefer_spacy: bool = True, rela_right_bug: bool = True) -> ExpressionParser:
    """spaCy parser when available (reference-parity), heuristic otherwise."""
    if prefer_spacy:
        try:
            from .spacy_parser import SpacyParser

            return SpacyParser(rela_right_bug=rela_right_bug)
        except Exception:
            pass
    return HeuristicParser(rela_right_bug=rela_right_bug)
