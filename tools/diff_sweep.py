#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""Differential sweep: generate a corpus from the fixture grammar with a
DIFFERENT seed (and optionally scaled counts), run the REFERENCE extractor,
and dump docs + expected records/spans to a temp dir for
`graft.tools.DiffCheck` to compare against the Scala kernel.

Usage: python3 tools/diff_sweep.py <outDir> <seed> [countMultiplier]

Nothing here is committed as fixtures — this is a divergence hunt; any doc
that diverges should be minimized and promoted into gen_fixtures.py.
"""
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import gen_fixtures as gf  # noqa: E402

def perturb(rng, pages):
    """Whitespace/structure mutations the committed grammar never produces:
    trailing spaces, doubled inner spaces, injected blank lines. Applied to
    the input BEFORE both extractors run, so divergence = kernel bug."""
    out = []
    for p in pages:
        nl = []
        for l in p.split("\n"):
            if rng.random() < 0.10:
                l = l + " " * rng.randint(1, 3)
            if rng.random() < 0.05:
                l = l.replace(" ", "  ", 1)
            nl.append(l)
            if rng.random() < 0.03:
                nl.append("")
        out.append("\n".join(nl))
    return out


KEYWORD_FLIPS = [
    ("BETWEEN", "Between"), ("Before:", "BEFORE:"), ("ORDER", "Order"),
    ("JUDGMENT", "Judgment"), ("Plaintiff", "PLAINTIFF"),
    ("Defendant", "DEFENDANT"), ("Date of Hearing", "DATE OF HEARING"),
    ("instructed by", "Instructed By"),
]


def mutate(rng, pages):
    """Aggressive semantic mutations: structural-keyword case flips, curly
    quotes, en-dashes. Stresses case-flag fidelity of the regex ports —
    whatever the reference does with these, the kernel must do too."""
    out = []
    for p in pages:
        if rng.random() < 0.5:
            a, b = KEYWORD_FLIPS[rng.randrange(len(KEYWORD_FLIPS))]
            p = p.replace(a, b)
        if rng.random() < 0.3:
            p = p.replace('"', "“").replace("'", "’")
        if rng.random() < 0.3:
            p = p.replace(" - ", " – ")
        out.append(p)
    return perturb(rng, out)


# Chinese-path structural keywords (P10 case numbers, P14 parties, P17
# judges, P20 footer lawyers) mutated with intra-keyword spaces — the form
# court PDFs actually produce (the reference's court cleaner normalizes
# 香 港 → 香港 but most other zh extractors do NOT) — plus full-width
# punctuation/space swaps.
ZH_KEYWORD_FLIPS = [
    ("被告人", "被 告 人"), ("原告人", "原 告 人"), ("法官", "法 官"),
    ("被告", "被　告"), ("原告", "原　告"), ("律師", "律 師"),
    ("第一", "第 一"), ("第二", "第 二"), ("民事訴訟", "民 事 訴 訟"),
    ("高等法院", "高 等 法 院"), ("判決", "判 決"),
    (":", "："), ("(", "（"), (")", "）"),
]


def mutate_zh(rng, pages):
    """zh-kernel fuzz depth equal to the English `mutate` mode: keyword
    space-injection, full-width punctuation, ideographic spaces. Differential
    ground truth stays the reference run on the SAME mutated input."""
    out = []
    for p in pages:
        if rng.random() < 0.6:
            a, b = ZH_KEYWORD_FLIPS[rng.randrange(len(ZH_KEYWORD_FLIPS))]
            p = p.replace(a, b)
        if rng.random() < 0.3:
            p = p.replace(" ", "　", 1)  # ideographic space
        if rng.random() < 0.2:
            p = p.replace("。", ".", 1)
        out.append(p)
    return perturb(rng, out)


def main():
    out = Path(sys.argv[1])
    # Refuse a dirty output dir: regenerating at a different multiplier
    # leaves stale docs from the previous run in other archetype dirs while
    # the flat golden dir keeps only the newest — DiffCheck then reports
    # phantom divergences (docs paired with the OTHER doc's golden).
    if out.exists() and any(out.iterdir()):
        sys.exit(f"refusing to write into non-empty {out} — use a fresh dir")
    seed = int(sys.argv[2])
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    mode = sys.argv[4] if len(sys.argv) > 4 else "plain"
    gf.OUT = out
    gf.rng = random.Random(seed)

    # Collision guard: archetypes share id formats (e.g. hca_between and
    # hca_split_year both mint HCA%06d_%Y), and the flat golden dirs would
    # silently pair a doc with the OTHER doc's golden at high multipliers.
    # Re-roll until the id is fresh (sweep-only; the committed fixture
    # counts are collision-free by construction).
    seen = set()

    def wrap(f, m):
        def g(rng, idx):
            doc_id, pages = f(rng, idx)
            while doc_id in seen:
                doc_id, pages = f(rng, idx)
            seen.add(doc_id)
            return doc_id, (m(rng, pages) if m else pages)
        return g

    mutator = {"perturb": perturb, "mutate": mutate,
               "mutate_zh": mutate_zh}.get(mode)
    gf.ARCHETYPES = [
        (n, wrap(f, mutator), c * mult) for (n, f, c) in gf.ARCHETYPES]
    gf.main()

if __name__ == "__main__":
    main()
