#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""Generate expected single-case viewer graphs by RUNNING the reference's
`SingleCaseKnowledgeGraph.create_case_graph`
(`/root/reference/single_case_knowledge_graph.py:122-326`) on fixture case
dicts, dumping (nodes, edges) JSON for CaseViewerSpec to assert against.

The reference module imports Dash/Cytoscape (not installed here); they are
only needed by the UI layer, so they're stubbed with empty modules and the
class is instantiated without __init__ — `create_case_graph` itself touches
only `self.node_colors` and the parser methods.
"""
import json
import sys
import types
from pathlib import Path

# stub the UI deps so the module imports
for name in ("dash", "dash_cytoscape"):
    sys.modules[name] = types.ModuleType(name)
dash = sys.modules["dash"]
for attr in ("dcc", "html", "Input", "Output", "State", "callback_context",
             "dash_table", "Dash"):
    setattr(dash, attr, object)
sys.modules["dash_cytoscape"].load_extra_layouts = lambda: None

sys.path.insert(0, "/root/reference")
import single_case_knowledge_graph as sck  # noqa: E402

viewer = sck.SingleCaseKnowledgeGraph.__new__(sck.SingleCaseKnowledgeGraph)
# node_colors is assigned in the skipped __init__; replicate its literal
viewer.node_colors = {
    "Case": "#1f77b4", "Plaintiff": "#2ca02c", "Defendant": "#d62728",
    "Judge": "#9467bd", "Court": "#7f7f7f", "Lawyer": "#8c564b",
    "LawFirm": "#e377c2", "Amount": "#ff7f0e",
}

FIXTURES = {
    # a real golden record (english, multi-plaintiff, amounts, no
    # plaintiff_lawyer/defendant_lawyer/lawyer_segment keys)
    "golden_en": json.loads(Path(
        "src/test/resources/fixtures/golden/records/HCA000181_2015.json"
    ).read_text(encoding="utf-8")),
    # a real golden record (chinese, plaintiff_lawyer present)
    "golden_zh": json.loads(Path(
        "src/test/resources/fixtures/golden/records/HCA001810_2018C.json"
    ).read_text(encoding="utf-8")),
    # synthetic: exercises lawyer sides, the Ltd/Co firm drop, duplicate
    # lawyer names across sides (sparse lawyer_{i} ids), missing
    # case_number key ('Unknown' label), blank judge, short court (the
    # unconditional '...' suffix)
    "synthetic_lawyers": {
        "plaintiff": "WONG TAI MAN (1st Plaintiff) | CHAN SIU MING (2nd Plaintiff)",
        "defendant": "GOLDEN DRAGON LIMITED",
        "judge": "unknown",
        "court_name": "HIGH COURT",
        "plaintiff_lawyer": "Mr John Tse, instructed by Wong & Co, for the plaintiff",
        "defendant_lawyer": "Mr John Tse (Lee Partners) for the defendant",
        "lawyer_segment": "Ms Mary Cheung, instructed by Temple Chambers, for the plaintiff",
        "claim_amount": "HK$1,000,000",
        "judgment_amount": "",
    },
}

out = {}
for key, case in FIXTURES.items():
    out[key] = {"case": case, "graph": viewer.create_case_graph(case)}

dst = Path("src/test/resources/fixtures/golden/viewer_graph.json")
dst.write_text(json.dumps(out, ensure_ascii=False, indent=1, sort_keys=True),
               encoding="utf-8")
print(f"wrote {dst}")
for key, v in out.items():
    g = v["graph"]
    print(f"  {key}: {len(g['nodes'])} nodes, {len(g['edges'])} edges")
