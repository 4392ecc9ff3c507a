"""Scientific-name canonicalization (deterministic gnparser analogue).

The reference shells out to the external ``gnparser`` binary per value
(/root/reference/src/utils/gnparser.py:14-36, utils/scientific_name.py:4-11)
to canonicalize binomials: ``"Rosa canina L., 1753"`` → ``"Rosa canina"``.
That binary isn't available (and wouldn't be hermetic), so this implements
the canonical-form subset in-process behind the same contract
(string → canonical string; comma/slash-separated multi-names handled).

In Ray Data this runs inside the coercion stage's batch UDF — the
reference's per-value subprocess becomes a pure vectorizable function (the
actor-pool + persistent-worker pattern of SURVEY.md ST5 is only needed when
a real external parser is plugged back in).
"""

from __future__ import annotations

import re
from typing import List

_RANK_TOKENS = frozenset(
    {"var", "var.", "subsp", "subsp.", "ssp", "ssp.", "f", "f.", "forma"}
)
_EPITHET_RE = re.compile(r"^[a-zà-ÿ-]+$")
_GENUS_RE = re.compile(r"^[A-ZÀ-Þ][a-zà-ÿ-]+$")
_HYBRID_MARKS = ("×", "x")


# gnparser's "approximation" forms (sp./spp./cf./aff. after the genus):
# the canonical form is the genus alone
_SP_TOKENS = frozenset({"sp", "sp.", "spp", "spp.", "cf", "cf.", "aff", "aff."})


def canonicalize_scientific_name(value: str) -> str:
    """Best-effort canonical binomial/trinomial: keep Genus + epithet
    (+ rank + infraspecific epithet), drop authorship/years/annotations.
    Returns the input unchanged when no genus+epithet shape is found
    (mirrors the reference's pass-through on parse failure)."""
    out = _try_canonicalize(value)
    return value if out is None else out


def _try_canonicalize(value: str):
    """Grammar core: canonical string on success, ``None`` when the value
    doesn't parse as a name (callers choose the pass-through form)."""
    tokens = value.replace(",", " ").split()
    if not tokens:
        return None
    out: List[str] = []
    i = 0
    # optional hybrid mark
    if tokens[0] in _HYBRID_MARKS and len(tokens) > 1:
        i = 1
    if i >= len(tokens) or not _GENUS_RE.match(tokens[i]):
        return None
    genus = tokens[i]
    i += 1
    if i < len(tokens) and tokens[i].lower() in _SP_TOKENS:
        return genus  # approximation: "Acaena sp." → "Acaena"
    if i >= len(tokens) or not _EPITHET_RE.match(tokens[i]) or len(tokens[i]) < 2:
        return None
    epithet = tokens[i]
    i += 1
    out = [genus, epithet]
    # optional infraspecific: "var. x" / "subsp. x" or a bare epithet
    while i < len(tokens):
        tok = tokens[i]
        low = tok.lower()
        if low in _RANK_TOKENS and i + 1 < len(tokens) and _EPITHET_RE.match(
            tokens[i + 1]
        ):
            rank = low.rstrip(".")
            rank = {"ssp": "subsp", "forma": "f"}.get(rank, rank)
            out.extend([rank + ".", tokens[i + 1]])
            i += 2
            continue
        break  # authorship / year / anything else → stop
    return " ".join(out)


def parse_scientific_name(name: str) -> str:
    """gnparser-analogue with ``--capitalize`` semantics
    (utils/gnparser.py:7-12 + the CLI flag): split multi-names on
    comma/slash, capitalize the first letter of each part (so lowercase
    input like "maytenus ilicifolia mart." parses), canonicalize, rejoin
    with ', '."""
    parts = [p.strip() for p in re.split(r"[,/]", name) if p.strip()]
    if not parts:
        return name

    def one(part: str) -> str:
        cap = part[0].upper() + part[1:] if part else part
        out = _try_canonicalize(cap)
        # parse failure → the ORIGINAL (uncapitalized) part passes through,
        # matching gnparser's keep-as-is on unparseable input
        return part if out is None else out

    return ", ".join(one(p) for p in parts)


class scientific_name(str):
    """The reference's coercible pseudo-type (utils/scientific_name.py):
    constructing one canonicalizes the value; usable as a ColumnSchema
    column type (``species:scientific_name``)."""

    pydantic_field_description = (
        "A taxonomical name in binomial nomenclature (e.g. Homo sapiens)"
    )

    def __new__(cls, value: str) -> "scientific_name":
        return super().__new__(cls, parse_scientific_name(value))


def canonicalize_multi(value: str) -> str:
    """Comma/slash-separated multi-name handling (gnparser.py:7-12):
    canonicalize each part, rejoin with ', '."""
    parts = re.split(r"[,/]", value)
    canon = [canonicalize_scientific_name(p.strip()) for p in parts if p.strip()]
    return ", ".join(canon) if canon else value
