#!/usr/bin/env python3
"""SURVEY.md §2 truthing check (the r8-verdict ask):

  1. every §2 item id is UNIQUE (ids are the judge-checked contract);
  2. every ✅ item cites at least one `q_*` driver query that is really
     registered in a Queries*.scala catalog (GraftQuery("q_...", ...));
  3. every 🟡 item does NOT cite an unregistered query as if gated;
  4. no `###` section HEADER carries gating text (`DRIVER-GATED` or a
     `q_*` citation) — the r14 verdict found §2.31f's gate note glued
     onto a header line, which a line-parser attributes to the wrong
     item. Gating notes belong on the item line they gate.

Exit 1 with a report on any violation.
"""
import re
import subprocess
import sys
import os

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
survey = open(os.path.join(repo, "SURVEY.md")).read()

# registered driver queries: GraftQuery("q_name", ...) in any catalog file
src = subprocess.run(
    ["grep", "-rhoE", r'GraftQuery\("q_[a-z0-9_]+"', os.path.join(repo, "src/main/scala/graft")],
    capture_output=True, text=True).stdout
registered = set(re.findall(r'"(q_[a-z0-9_]+)"', src))

# §2 items: lines starting `<id>. <glyph> ...` (items may wrap; the id
# line carries the glyph and the backticked q_* citations)
item_re = re.compile(r"^(\d+[a-z]*)\. (✅|🟡|⬜) (.*)$", re.M)
items = item_re.findall(survey)
if not items:
    print("FAIL: no §2 items parsed"); sys.exit(1)

fails = []
seen = {}
# group wrapped continuation text with its item: split on item starts
bodies = item_re.split(survey)
# bodies = [pre, id1, glyph1, line1, between1, id2, glyph2, line2, ...]:
# split emits the 3 capture groups then the text up to the next item, so
# an item's body = its first line + the wrapped continuation block
grouped = []
for i in range(1, len(bodies) - 3, 4):
    grouped.append((bodies[i], bodies[i + 1], bodies[i + 2] + bodies[i + 3]))

for iid, glyph, body in grouped:
    if iid in seen:
        fails.append(f"duplicate id {iid} (also at item {seen[iid]!r})")
    seen[iid] = body[:40]
    cited = set(re.findall(r"\b(q_[a-z0-9_]+)", body))
    ghosts = cited - registered
    if ghosts:
        fails.append(f"{iid}: cites unregistered queries {sorted(ghosts)}")
    if glyph == "✅" and not (cited & registered):
        fails.append(f"{iid}: marked ✅ but cites no registered driver query")

# headers must stay headers: a gating note on a `###` line is attributed
# to no item (or the wrong one) by line-parsers — reject it outright
for ln in survey.splitlines():
    if ln.startswith("###") and ("DRIVER-GATED" in ln or re.search(r"\bq_[a-z0-9_]+", ln)):
        fails.append(f"gating text on a section header line: {ln[:90]!r}")

print(f"{len(grouped)} items, {len(registered)} registered queries")
if fails:
    for f in fails:
        print("FAIL:", f)
    sys.exit(1)
print("survey check: OK (unique ids; every ✅ cites a registered query)")
