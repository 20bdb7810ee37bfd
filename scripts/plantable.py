#!/usr/bin/env python3
"""Render the PLANS.md summary table from a graft.Plans dump."""
import re, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans.txt"
txt = open(src).read()
blocks = []
for block in txt.split("===== ")[1:]:
    name, body = block.split(" =====", 1)
    if name.strip() == "Subqueries" and blocks:
        # Spark's formatted explain emits subqueries (e.g. x11's dynamic
        # partition pruning subquery) as their own "===== Subqueries ====="
        # section INSIDE a query's dump — fold it into that query's body
        # instead of fabricating a query named "Subqueries"
        blocks[-1][1] += body
    else:
        blocks.append([name.strip(), body])
rows = []
for name, body in blocks:
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", body))
    bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", body))
    pushed = "yes" if re.search(r"PushedFilters: \[.*?IsNotNull|PushedFilters: \[.*?(GreaterThan|LessThan|EqualTo)", body) else "—"
    joins = sorted(set(re.findall(r"\(\d+\) (\w*Join\w*)", body)) - {""})
    wgl = "WGL" if "WindowGroupLimit" in body else ""
    topk = "TakeOrdered" if "TakeOrderedAndProject" in body else ""
    extra = "+".join(x for x in [wgl, topk] if x)
    rows.append((name, shuffles, bcasts, pushed, "+".join(joins) or "—", extra))
print("| query | shuffles | broadcasts | pushed filters | joins | notes |")
print("|---|---|---|---|---|---|")
for r in rows:
    print("| {} | {} | {} | {} | {} | {} |".format(*r))
