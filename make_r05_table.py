#!/usr/bin/env python3
"""Aggregate ATE_r05_seq*_asd.json rows into ATE_r05_table.md (reuses
run_kitti_suite.make_table)."""
import glob
import json

from run_kitti_suite import make_table

rows = []
for p in sorted(glob.glob("ATE_r05_seq*_asd.json")):
    with open(p) as f:
        rows.append(json.load(f))
rows.sort(key=lambda r: r["seq"])
table = make_table(rows)
hdr = ("# ATE_r05 — flagship ASD suite (final tree, pipelined tracking + "
       "async mapping)\n\n"
       "All rows: `--descriptor asd --asdnet_weights asdnet_weights.pkl "
       "--voc_addr voc_patch_r04.npz --scale 1.0`, run under the final "
       "round-5 tree on the real TPU chip. %path is over the recomposed "
       "frame trajectory (reference protocol, System.cc:482-541).\n\n")
with open("ATE_r05_table.md", "w") as f:
    f.write(hdr + table + "\n")
print(table)
