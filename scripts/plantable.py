#!/usr/bin/env python3
"""Render the PLANS.md summary table from a graft.Plans dump."""
import re, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans.txt"
txt = open(src).read()
rows = []
for block in txt.split("===== ")[1:]:
    name, body = block.split(" =====", 1)
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", body))
    bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", body))
    pushed = "yes" if re.search(r"PushedFilters: \[.*?IsNotNull|PushedFilters: \[.*?(GreaterThan|LessThan|EqualTo)", body) else "—"
    joins = sorted(set(re.findall(r"\(\d+\) (\w*Join\w*)", body)) - {""})
    wgl = "WGL" if "WindowGroupLimit" in body else ""
    topk = "TakeOrdered" if "TakeOrderedAndProject" in body else ""
    extra = "+".join(x for x in [wgl, topk] if x)
    rows.append((name.strip(), shuffles, bcasts, pushed, "+".join(joins) or "—", extra))
print("| query | shuffles | broadcasts | pushed filters | joins | notes |")
print("|---|---|---|---|---|---|")
for r in rows:
    print("| {} | {} | {} | {} | {} | {} |".format(*r))
