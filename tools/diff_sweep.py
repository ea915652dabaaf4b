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

def main():
    out = Path(sys.argv[1])
    seed = int(sys.argv[2])
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    gf.OUT = out
    gf.rng = random.Random(seed)
    gf.ARCHETYPES = [(n, f, c * mult) for (n, f, c) in gf.ARCHETYPES]
    gf.main()

if __name__ == "__main__":
    main()
